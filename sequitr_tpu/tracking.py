"""Lightweight frame-to-frame object linking (tracks from objects.h5).

The reference delegates tracking to btrack (its Bayesian cell tracker);
the segmentation outputs here stay btrack-compatible (``objects.h5``) and
that remains the supported path for publication-grade lineage tracking
(divisions, probabilistic motion models). This module adds what the
reference never had: a BUILT-IN linker good enough for QC, motility
statistics and emitter trajectories without leaving the framework —
globally-optimal per-frame-pair assignment (Hungarian algorithm on gated
Euclidean costs) with short-gap closing. It is deliberately simple: no
divisions, no merges, no motion model — a documented extension beyond the
reference's capability list, not a btrack replacement.

Exposed through the job API as the ``track_objects`` pipeline (consumes a
serve's ``objects.h5``, emits ``tracks.csv``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from sequitr_tpu.localize import FrameTable

__all__ = ["Track", "link_tables", "write_tracks_csv",
           "write_track_summaries_csv"]


@dataclasses.dataclass
class Track:
    """Summary of one linked trajectory."""

    track_id: int
    t_start: int
    t_end: int  # inclusive
    n_points: int
    length_px: float  # summed step length

    @property
    def duration(self) -> int:
        return self.t_end - self.t_start + 1


def _assign(cost: np.ndarray, gate: float) -> List[Tuple[int, int]]:
    """Globally-optimal matching under a hard distance gate.

    Hungarian on the raw costs, then pairs beyond the gate are discarded:
    with a rectangular matrix scipy's implementation already leaves the
    surplus rows/cols unmatched, and dropping over-gate pairs afterwards
    is equivalent to a gated assignment for metric costs at these sizes.
    """
    from scipy.optimize import linear_sum_assignment

    # flatten every over-gate pairing to one large constant so the
    # optimizer never trades a valid pair away to improve an invalid one
    # (invalid pairs are interchangeable; they are dropped below anyway)
    capped = np.where(cost <= gate, cost, gate * 1e6)
    rows, cols = linear_sum_assignment(capped)
    return [(int(r), int(c)) for r, c in zip(rows, cols) if cost[r, c] <= gate]


def link_tables(
    tables: Sequence[FrameTable],
    max_distance: float = 20.0,
    max_gap: int = 0,
) -> Tuple[List[np.ndarray], List[Track]]:
    """Link per-frame detections into tracks.

    ``tables``: per-frame ``FrameTable``s in t order (e.g. from
    ``localize.read_objects_h5``). ``max_distance``: hard gate (pixels)
    on a frame-to-frame step. ``max_gap``: how many consecutive frames a
    track may miss a detection and still be continued (0 = strict
    consecutive linking).

    Returns ``(track_ids, tracks)``: per-frame int32 arrays assigning a
    track id to every detection (aligned with each table's rows), and the
    per-track summaries. Detections that start a new trajectory get fresh
    ids; tracks are never merged or split.
    """
    if max_distance <= 0:
        raise ValueError(f"max_distance must be positive, got {max_distance}")
    if max_gap < 0:
        raise ValueError(f"max_gap must be >= 0, got {max_gap}")
    track_ids: List[np.ndarray] = []
    # active tracks: id -> (last_xyz, last_t, n_points, length)
    active: dict = {}
    summaries: dict = {}
    next_id = 0
    for t, tb in enumerate(tables):
        n = len(tb)
        ids = np.full(n, -1, np.int32)
        pts = tb.coords[:, 1:4].astype(np.float64) if n else np.zeros((0, 3))
        # drop tracks whose gap budget is spent
        for tid in [k for k, v in active.items() if t - v[1] > max_gap + 1]:
            del active[tid]
        if n and active:
            act_ids = list(active)
            act_pts = np.stack([active[k][0] for k in act_ids])
            cost = np.linalg.norm(
                act_pts[:, None, :] - pts[None, :, :], axis=-1
            )
            for r, c in _assign(cost, max_distance):
                tid = act_ids[r]
                step = float(cost[r, c])
                xyz, _, npts, length = active[tid]
                active[tid] = (pts[c], t, npts + 1, length + step)
                ids[c] = tid
        for c in range(n):
            if ids[c] < 0:  # unmatched detection: a new track is born
                ids[c] = next_id
                active[next_id] = (pts[c], t, 1, 0.0)
                next_id += 1
        for tid in set(int(i) for i in ids):
            _, last_t, npts, length = active[tid]
            summaries[tid] = Track(
                track_id=tid,
                t_start=summaries[tid].t_start if tid in summaries else t,
                t_end=last_t,
                n_points=npts,
                length_px=round(length, 3),
            )
        track_ids.append(ids)
    tracks = [summaries[k] for k in sorted(summaries)]
    return track_ids, tracks


def write_track_summaries_csv(
    path: str,
    tables: Sequence[FrameTable],
    track_ids: Sequence[np.ndarray],
    tracks: Sequence[Track],
) -> int:
    """One row per TRACK: the QC table (lifetime, path length, net
    displacement, mean speed, straightness). Returns the track count."""
    first: dict = {}
    last: dict = {}
    for tb, ids in zip(tables, track_ids):
        for i in range(len(tb)):
            tid = int(ids[i])
            xyz = tb.coords[i, 1:4]
            if tid not in first:
                first[tid] = xyz
            last[tid] = xyz
    with open(path, "w") as f:
        f.write(
            "track_id,t_start,t_end,n_points,length_px,"
            "net_displacement_px,mean_speed_px_per_frame,straightness\n"
        )
        for tr in tracks:
            net = float(
                np.linalg.norm(
                    last.get(tr.track_id, 0.0) - first.get(tr.track_id, 0.0)
                )
            )
            speed = tr.length_px / max(tr.duration - 1, 1)
            straight = net / tr.length_px if tr.length_px > 0 else 0.0
            f.write(
                f"{tr.track_id},{tr.t_start},{tr.t_end},{tr.n_points},"
                f"{tr.length_px:.3f},{net:.3f},{speed:.3f},{straight:.3f}\n"
            )
    return len(tracks)


def write_tracks_csv(
    path: str,
    tables: Sequence[FrameTable],
    track_ids: Sequence[np.ndarray],
) -> int:
    """Write linked detections as CSV (one row per detection, track-id
    first — trivially loadable by pandas/numpy/Fiji). Returns row count."""
    n = 0
    with open(path, "w") as f:
        f.write("track_id,t,x,y,z,label,area,intensity_mean\n")
        for tb, ids in zip(tables, track_ids):
            for i in range(len(tb)):
                c = tb.coords[i]
                f.write(
                    f"{int(ids[i])},{int(c[0])},{c[1]:.3f},{c[2]:.3f},"
                    f"{c[3]:.3f},{int(c[4])},{int(tb.area[i])},"
                    f"{tb.intensity_mean[i]:.4f}\n"
                )
                n += 1
    return n
