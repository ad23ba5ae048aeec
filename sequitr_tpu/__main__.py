"""Command-line interface: ``python -m sequitr_tpu <command>``.

Commands (the operational surface of the reference's server scripts):
  serve   — run the watched-directory image server
  submit  — file a job JSON into a server's jobs directory
  status  — print a job's status marker
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sequitr_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ap_serve = sub.add_parser("serve", help="run the image server")
    ap_serve.add_argument("--config", help="ServerConfiguration JSON path")
    ap_serve.add_argument("--jobs-dir", default="./jobs")
    ap_serve.add_argument("--models-dir", default="./models")
    ap_serve.add_argument("--poll-interval", type=float, default=1.0)

    ap_submit = sub.add_parser("submit", help="submit a job JSON")
    ap_submit.add_argument("--jobs-dir", default="./jobs")
    ap_submit.add_argument("spec", help="job spec JSON file (or '-' for stdin)")

    ap_status = sub.add_parser("status", help="read a job output status")
    ap_status.add_argument("output_dir")

    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")

    if args.cmd == "serve":
        from sequitr_tpu.config import ServerConfiguration
        from sequitr_tpu.server import ImageServer

        if args.config:
            cfg = ServerConfiguration.from_json(args.config)
        else:
            cfg = ServerConfiguration(
                jobs_dir=args.jobs_dir,
                models_dir=args.models_dir,
                poll_interval=args.poll_interval,
            )
        ImageServer(cfg).run_forever()
        return 0

    if args.cmd == "submit":
        from sequitr_tpu.server import submit_job

        spec = json.load(sys.stdin if args.spec == "-" else open(args.spec))
        job_id = submit_job(args.jobs_dir, spec)
        print(job_id)
        return 0

    if args.cmd == "status":
        import os

        path = os.path.join(args.output_dir, "status.json")
        print(open(path).read())
        return 0

    return 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:
        # downstream pipe (e.g. `status | grep -m1`) closed early — exit
        # quietly like standard unix tools instead of tracebacking
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        sys.exit(0)
