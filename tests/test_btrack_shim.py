"""btrack-consumer validation via a reader shim (round-4 verdict item 6).

``localize.export_btrack_h5*`` writes btrack's object-file layout, but
btrack itself is not installable here (no network egress), so nothing ever
*consumed* the file with btrack's read semantics. ``BtrackShimReader``
below is a test-only minimal reimplementation of the read side of
btrack's ``HDF5FileHandler`` (btrack/io/hdf.py, public API docs): the
``objects`` accessor reads ``/objects/obj_type_{n}/coords`` as rows of
(t, x, y, z, label), joins ``.../properties/*`` by row index, and
per-frame access slices coords by the ``map`` dataset's [start, end)
rows — exactly what btrack does before building its PyTrackObjects. The
round-trip tests assert a file written from real localization output
reconstructs per-frame object lists identical to what went in, including
the trailing-empty-frames map case (``localize.py`` ``n_frames``
handling) and the zero-object file.
"""


import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from sequitr_tpu import localize


class BtrackShimReader:
    """Read side of btrack's HDF5FileHandler object files (test shim)."""

    def __init__(self, path: str, obj_type: int = 1):
        self._f = h5py.File(path, "r")
        grp = self._f[f"objects/obj_type_{obj_type}"]
        self.coords = np.asarray(grp["coords"])  # (n, 5) t,x,y,z,label
        self.map = np.asarray(grp["map"])  # (n_frames, 2) [start, end)
        self.properties = {
            k: np.asarray(v) for k, v in grp["properties"].items()
        }

    def close(self):
        self._f.close()

    @property
    def n_frames(self) -> int:
        return len(self.map)

    def objects(self):
        """All objects as dicts, properties joined by row index."""
        out = []
        for i, (t, x, y, z, label) in enumerate(self.coords):
            row = {"t": int(t), "x": float(x), "y": float(y),
                   "z": float(z), "label": int(label)}
            for k, v in self.properties.items():
                row[k] = v[i]
            out.append(row)
        return out

    def objects_in_frame(self, t: int):
        start, end = self.map[t]
        return self.objects()[start:end]


def _scene_tables(n_frames_with_objects: int):
    """Real localization output from synthetic label maps."""
    from sequitr_tpu.data import synthetic

    tables = []
    for t in range(n_frames_with_objects):
        img, lab = synthetic.cells_frame(3_000 + t, (128, 128))
        tables.append(
            localize.localize_frame_table(lab, t=t, intensity=img, min_area=4)
        )
    return tables


class TestBtrackRoundTrip:
    def test_tables_roundtrip_per_frame(self, tmp_path):
        tables = _scene_tables(4)
        path = str(tmp_path / "objects.h5")
        total = localize.export_btrack_h5_tables(path, tables, n_frames=4)
        r = BtrackShimReader(path)
        try:
            assert r.n_frames == 4
            assert len(r.objects()) == total == sum(
                len(tb.coords) for tb in tables
            )
            for t, tb in enumerate(tables):
                got = r.objects_in_frame(t)
                assert len(got) == len(tb.coords)
                got_yx = sorted((o["y"], o["x"]) for o in got)
                want_yx = sorted(
                    (float(c[2]), float(c[1])) for c in tb.coords
                )
                np.testing.assert_allclose(got_yx, want_yx, rtol=1e-6)
                # properties joined by index, aligned with coords
                for o in got:
                    assert o["area"] >= 4
                    assert np.isfinite(o["intensity_mean"])
                # every object's t column matches its map slice
                assert all(o["t"] == t for o in got)
        finally:
            r.close()

    def test_trailing_empty_frames_map(self, tmp_path):
        """n_frames beyond the last object: btrack must still see the full
        movie length, with empty (start == end) trailing map rows."""
        tables = _scene_tables(2)
        path = str(tmp_path / "objects.h5")
        localize.export_btrack_h5_tables(path, tables, n_frames=6)
        r = BtrackShimReader(path)
        try:
            assert r.n_frames == 6
            for t in (2, 3, 4, 5):
                assert r.objects_in_frame(t) == []
            assert len(r.objects_in_frame(0)) == len(tables[0].coords)
        finally:
            r.close()

    def test_empty_file(self, tmp_path):
        path = str(tmp_path / "objects.h5")
        n = localize.export_btrack_h5_tables(path, [], n_frames=3)
        assert n == 0
        r = BtrackShimReader(path)
        try:
            assert r.n_frames == 3
            assert r.objects() == []
            assert all(r.objects_in_frame(t) == [] for t in range(3))
        finally:
            r.close()

    def test_object_list_export_matches_table_export(self, tmp_path):
        """The two writers (object-list and FrameTable) produce files the
        shim reads identically."""
        tables = _scene_tables(3)
        objs = []
        for tb in tables:
            t0 = int(tb.coords[0, 0]) if len(tb.coords) else 0
            for i in range(len(tb.coords)):
                c = tb.coords[i]
                objs.append(localize.LocalizedObject(
                    t=int(c[0]), x=float(c[1]), y=float(c[2]), z=float(c[3]),
                    label=int(c[4]), area=int(tb.area[i]),
                    intensity_mean=float(tb.intensity_mean[i]),
                ))
        p1, p2 = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
        localize.export_btrack_h5_tables(p1, tables, n_frames=3)
        localize.export_btrack_h5(p2, objs, n_frames=3)
        ra, rb = BtrackShimReader(p1), BtrackShimReader(p2)
        try:
            np.testing.assert_allclose(ra.coords, rb.coords, rtol=1e-6)
            np.testing.assert_array_equal(ra.map, rb.map)
            np.testing.assert_array_equal(
                ra.properties["area"], rb.properties["area"]
            )
        finally:
            ra.close()
            rb.close()

    def test_serve_output_is_shim_readable(self, tmp_path):
        """The objects.h5 a real segmentation serve writes is consumable
        with btrack read semantics (the full product path, not just the
        export function)."""
        import json

        from sequitr_tpu.config import ServerConfiguration
        from sequitr_tpu.data import synthetic, tiff
        from sequitr_tpu.models import fixtures
        from sequitr_tpu.server import ImageServer, save_model, submit_job

        cfg_srv = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
        )
        cfg_srv.ensure_dirs()
        kind, cfg, params, state, _ = fixtures.load("unet2d_cells")
        save_model(cfg_srv.models_dir, "segcells", "unet", cfg, params, state)
        stack = np.stack(
            [synthetic.cells_frame(8_000 + t, (128, 128))[0] for t in range(3)]
        )
        tiff.write_stack(str(tmp_path / "stack.tif"), stack)
        out = tmp_path / "out"
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d",
             "params": {"model": "segcells", "patch": [128, 128],
                        "overlap": [0, 0]},
             "input": [str(tmp_path / "stack.tif")], "output": str(out)},
            job_id="serve",
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.loads((out / "status.json").read_text())
        assert status["state"] == "complete", status
        r = BtrackShimReader(str(out / "objects.h5"))
        try:
            assert r.n_frames == 3
            # trained weights on synthetic cells: every frame finds objects
            for t in range(3):
                assert len(r.objects_in_frame(t)) > 0
        finally:
            r.close()
