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
    net_displacement_px: float  # |last - first|

    @property
    def duration(self) -> int:
        return self.t_end - self.t_start + 1

    @property
    def n_links(self) -> int:
        return max(self.n_points - 1, 0)

    @property
    def mean_speed(self) -> float:
        return self.length_px / max(self.duration - 1, 1)

    @property
    def straightness(self) -> float:
        return (
            self.net_displacement_px / self.length_px
            if self.length_px > 0 else 0.0
        )


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
    # one record per track for its whole life (no per-frame dataclass
    # churn — FrameTable's own rationale): [first_xyz, last_xyz, t0,
    # last_t, n_points, length]
    records: List[list] = []
    active: set = set()  # ids still eligible for matching
    for t, tb in enumerate(tables):
        n = len(tb)
        ids = np.full(n, -1, np.int32)
        pts = tb.coords[:, 1:4].astype(np.float64) if n else np.zeros((0, 3))
        # retire tracks whose gap budget is spent
        active = {k for k in active if t - records[k][3] <= max_gap + 1}
        if n and active:
            act_ids = sorted(active)
            act_pts = np.stack([records[k][1] for k in act_ids])
            cost = np.linalg.norm(
                act_pts[:, None, :] - pts[None, :, :], axis=-1
            )
            for r, c in _assign(cost, max_distance):
                tid = act_ids[r]
                rec = records[tid]
                rec[5] += float(cost[r, c])
                rec[1] = pts[c]
                rec[3] = t
                rec[4] += 1
                ids[c] = tid
        for c in range(n):
            if ids[c] < 0:  # unmatched detection: a new track is born
                ids[c] = len(records)
                records.append([pts[c], pts[c], t, t, 1, 0.0])
                active.add(int(ids[c]))
        track_ids.append(ids)
    tracks = [
        Track(
            track_id=i,
            t_start=r[2],
            t_end=r[3],
            n_points=r[4],
            length_px=round(r[5], 3),
            net_displacement_px=round(float(np.linalg.norm(r[1] - r[0])), 3),
        )
        for i, r in enumerate(records)
    ]
    return track_ids, tracks


def write_track_summaries_csv(path: str, tracks: Sequence[Track]) -> int:
    """One row per TRACK: the QC table (lifetime, path length, net
    displacement, mean speed, straightness). Returns the track count.
    (Endpoints live on ``Track`` — no re-walk of the detections.)"""
    with open(path, "w") as f:
        f.write(
            "track_id,t_start,t_end,n_points,length_px,"
            "net_displacement_px,mean_speed_px_per_frame,straightness\n"
        )
        for tr in tracks:
            f.write(
                f"{tr.track_id},{tr.t_start},{tr.t_end},{tr.n_points},"
                f"{tr.length_px:.3f},{tr.net_displacement_px:.3f},"
                f"{tr.mean_speed:.3f},{tr.straightness:.3f}\n"
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
