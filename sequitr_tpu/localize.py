"""Object localization: label maps -> per-object features -> btrack HDF5.

Rebuilds sequitr's localization export (SURVEY.md §3.5): connected-component
labelling of segmentation masks, per-object centroid/area/class features,
and an HDF5 file in the layout btrack's ``HDF5FileHandler`` consumes
(``objects/obj_type_N/coords`` (n, 5) [t, x, y, z, label] + ``map`` frame
index; spec decision — layout reconstructed from btrack's public reader,
reference export unavailable).

This is irregular, data-dependent host work (SURVEY.md §3.5), so it runs
in numpy/scipy on the host; a native C++ union-find labeller
(``sequitr_tpu.native``) accelerates the labelling hot loop when built,
with scipy as the always-available fallback.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
from scipy import ndimage

__all__ = ["LocalizedObject", "label_components", "localize_frame", "export_btrack_h5"]


@dataclasses.dataclass
class LocalizedObject:
    t: int
    x: float  # centroid column
    y: float  # centroid row
    z: float
    label: int  # semantic class
    area: int
    intensity_mean: float = 0.0


def label_components(mask: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Connected components of a boolean/int mask -> int32 instance map.

    Uses the native C++ union-find labeller when available (4-connectivity,
    2D), else scipy.ndimage.label.
    """
    mask = np.asarray(mask)
    if mask.ndim == 2 and connectivity == 1:
        try:
            from sequitr_tpu import native

            if native.available():
                return native.label_components(mask != 0)
        except ImportError:
            pass
    structure = ndimage.generate_binary_structure(mask.ndim, connectivity)
    labelled, _ = ndimage.label(mask != 0, structure=structure)
    return labelled.astype(np.int32)


def localize_frame(
    class_map: np.ndarray,
    t: int = 0,
    intensity: Optional[np.ndarray] = None,
    min_area: int = 1,
    z: float = 0.0,
) -> List[LocalizedObject]:
    """Extract per-object centroids/features from a 2D class label map.

    Foreground = ``class_map > 0``; instances come from connected components
    of the foreground; each object's semantic ``label`` is the majority
    class over its pixels (spec decision).
    """
    class_map = np.asarray(class_map)
    inst = label_components(class_map > 0)
    n = int(inst.max())
    if n == 0:
        return []
    ids = np.arange(1, n + 1)
    areas = ndimage.sum_labels(np.ones_like(inst), inst, ids)
    cys, cxs = zip(*ndimage.center_of_mass(np.ones_like(inst), inst, ids))
    if intensity is not None:
        means = ndimage.mean(intensity, inst, ids)
    else:
        means = np.zeros(n)
    # majority semantic class per instance
    classes = ndimage.labeled_comprehension(
        class_map, inst, ids, lambda v: np.bincount(v.astype(np.int64)).argmax(), int, 0
    )
    out = []
    for i in range(n):
        if areas[i] < min_area:
            continue
        out.append(
            LocalizedObject(
                t=t,
                x=float(cxs[i]),
                y=float(cys[i]),
                z=z,
                label=int(classes[i]),
                area=int(areas[i]),
                intensity_mean=float(means[i]),
            )
        )
    return out


def localize_volume(
    class_map: np.ndarray,
    t: int = 0,
    intensity: Optional[np.ndarray] = None,
    min_area: int = 1,
) -> List[LocalizedObject]:
    """3D variant: per-object centroids from a (Z, H, W) class label map.

    Instances from 3D connected components of the foreground; ``z`` is the
    centroid plane (BASELINE config #4's volumetric output feeding btrack).
    """
    class_map = np.asarray(class_map)
    if class_map.ndim != 3:
        raise ValueError(f"expected (Z, H, W), got {class_map.shape}")
    structure = ndimage.generate_binary_structure(3, 1)
    inst, n = ndimage.label(class_map > 0, structure=structure)
    if n == 0:
        return []
    ids = np.arange(1, n + 1)
    areas = ndimage.sum_labels(np.ones_like(inst), inst, ids)
    coms = ndimage.center_of_mass(np.ones_like(inst), inst, ids)
    means = (
        ndimage.mean(intensity, inst, ids) if intensity is not None else np.zeros(n)
    )
    classes = ndimage.labeled_comprehension(
        class_map, inst, ids, lambda v: np.bincount(v.astype(np.int64)).argmax(), int, 0
    )
    out = []
    for i, (cz, cy, cx) in enumerate(coms):
        if areas[i] < min_area:
            continue
        out.append(
            LocalizedObject(
                t=t, x=float(cx), y=float(cy), z=float(cz),
                label=int(classes[i]), area=int(areas[i]),
                intensity_mean=float(means[i]),
            )
        )
    return out


def export_btrack_h5(
    path: str,
    objects: Sequence[LocalizedObject],
    obj_type: int = 1,
    n_frames: Optional[int] = None,
) -> None:
    """Write objects to HDF5 in btrack's object-file layout.

    Layout (btrack HDF5FileHandler convention):
      /objects/obj_type_{N}/coords : (n, 5) float32 [t, x, y, z, label]
      /objects/obj_type_{N}/map    : (n_frames, 2) int32 per-frame
                                     [start, end) slices into coords
    Objects are sorted by t; properties (area, intensity) are stored
    alongside under .../properties. Pass ``n_frames`` (the SOURCE stack's
    frame count) so trailing object-free frames still get (empty) map
    rows — otherwise a per-frame consumer sees a shorter movie and
    misaligns tracks with the stack; without it the map ends at the last
    detected object's frame.
    """
    import h5py

    objs = sorted(objects, key=lambda o: o.t)
    coords = np.asarray(
        [[o.t, o.x, o.y, o.z, o.label] for o in objs], dtype=np.float32
    ).reshape(-1, 5)
    area = np.asarray([o.area for o in objs], dtype=np.int32)
    imean = np.asarray([o.intensity_mean for o in objs], dtype=np.float32)

    nf = int(n_frames) if n_frames is not None else (
        int(max(o.t for o in objs)) + 1 if objs else 0
    )
    if objs and nf <= int(max(o.t for o in objs)):
        raise ValueError(
            f"n_frames={nf} but objects reach t={int(max(o.t for o in objs))}"
        )
    if nf:
        starts = np.searchsorted(coords[:, 0], np.arange(nf), side="left")
        ends = np.searchsorted(coords[:, 0], np.arange(nf), side="right")
        fmap = np.stack([starts, ends], axis=1).astype(np.int32)
    else:
        fmap = np.zeros((0, 2), dtype=np.int32)

    with h5py.File(path, "w") as f:
        grp = f.create_group(f"objects/obj_type_{obj_type}")
        grp.create_dataset("coords", data=coords)
        grp.create_dataset("map", data=fmap)
        props = grp.create_group("properties")
        props.create_dataset("area", data=area)
        props.create_dataset("intensity_mean", data=imean)
