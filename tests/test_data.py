"""Tests: TIFF codec, TFRecord-compatible records, native helpers, prefetch."""

import os

import numpy as np
import pytest

from sequitr_tpu import native
from sequitr_tpu.data import records, tiff
from sequitr_tpu.data.prefetch import batch_iterator, prefetch_to_device


class TestTiff:
    @pytest.mark.parametrize(
        "dtype", [np.uint8, np.uint16, np.uint32, np.float16, np.float32]
    )
    def test_roundtrip(self, tmp_path, dtype):
        stack = (np.random.default_rng(0).random((3, 32, 48)) * 200).astype(dtype)
        p = str(tmp_path / "s.tif")
        tiff.write_stack(p, stack)
        np.testing.assert_array_equal(tiff.read_stack(p), stack)

    def test_single_frame_squeeze(self, tmp_path):
        frame = np.arange(64, dtype=np.uint16).reshape(8, 8)
        p = str(tmp_path / "f.tif")
        tiff.write_stack(p, frame)
        out = tiff.read_stack(p)
        assert out.shape == (8, 8)
        np.testing.assert_array_equal(out, frame)

    def test_pil_can_read_ours(self, tmp_path):
        from PIL import Image

        stack = (np.random.default_rng(1).random((2, 16, 16)) * 255).astype(np.uint8)
        p = str(tmp_path / "s.tif")
        tiff.write_stack(p, stack)
        img = Image.open(p)
        assert getattr(img, "n_frames", 1) == 2
        img.seek(1)
        np.testing.assert_array_equal(np.asarray(img), stack[1])

    def test_reads_pil_written(self, tmp_path):
        from PIL import Image

        arr = (np.random.default_rng(2).random((16, 16)) * 255).astype(np.uint8)
        p = str(tmp_path / "pil.tif")
        Image.fromarray(arr).save(p)
        np.testing.assert_array_equal(tiff.read_stack(p), arr)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "x.tif")
        with open(p, "wb") as f:
            f.write(b"not a tiff at all")
        with pytest.raises(ValueError):
            tiff.read_stack(p)


class TestTiffStreaming:
    """Lazy per-frame reader + incremental append writer (round-3 streaming
    serving: stacks larger than host RAM must serve with bounded buffers)."""

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32, np.float32])
    def test_lazy_reader_matches_read_stack(self, tmp_path, dtype):
        stack = (np.random.default_rng(0).random((4, 24, 40)) * 200).astype(dtype)
        p = str(tmp_path / "s.tif")
        tiff.write_stack(p, stack)
        with tiff.TiffReader(p) as r:
            assert r.n_frames == 4
            assert r.shape == (4, 24, 40)
            assert r.dtype == np.dtype(dtype)
            for t in range(4):
                np.testing.assert_array_equal(r.read_frame(t), stack[t])
            np.testing.assert_array_equal(np.stack(list(r)), stack)

    def test_lazy_reader_reads_pil_written(self, tmp_path):
        from PIL import Image

        frames = [
            (np.random.default_rng(i).random((16, 16)) * 255).astype(np.uint8)
            for i in range(3)
        ]
        p = str(tmp_path / "pil.tif")
        Image.fromarray(frames[0]).save(
            p, save_all=True, append_images=[Image.fromarray(f) for f in frames[1:]]
        )
        with tiff.TiffReader(p) as r:
            for t in range(3):
                np.testing.assert_array_equal(r.read_frame(t), frames[t])

    @pytest.mark.parametrize("comp", ["tiff_lzw", "tiff_deflate", "packbits"])
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_lazy_reader_decodes_compressed(self, tmp_path, comp, dtype):
        """Real acquisitions ship LZW/Deflate/PackBits strips; the lazy
        reader decodes all three (libtiff-written via PIL as the oracle)."""
        from PIL import Image

        rng = np.random.default_rng(2)
        stack = rng.poisson(30, (3, 33, 47)).astype(dtype)
        p = str(tmp_path / "comp.tif")
        ims = [Image.fromarray(f) for f in stack]
        ims[0].save(p, compression=comp, save_all=True, append_images=ims[1:])
        with tiff.TiffReader(p) as r:
            got = np.stack([r.read_frame(t) for t in range(r.n_frames)])
        assert got.dtype == stack.dtype
        np.testing.assert_array_equal(got, stack)
        np.testing.assert_array_equal(tiff.read_stack(p), stack)

    @pytest.mark.parametrize("comp", ["tiff_lzw", "tiff_deflate"])
    def test_lazy_reader_horizontal_predictor(self, tmp_path, comp):
        """Predictor 2 (horizontal differencing, tag 317) is the common
        companion of LZW/Deflate; undone by a wrapping per-row prefix sum."""
        from PIL import Image

        arr = np.random.default_rng(3).poisson(900, (41, 29)).astype(np.uint16)
        p = str(tmp_path / "pred.tif")
        Image.fromarray(arr).save(p, compression=comp, tiffinfo={317: 2})
        with tiff.TiffReader(p) as r:
            np.testing.assert_array_equal(r.read_frame(0), arr)

    @pytest.mark.parametrize("comp", [None, "packbits"])
    def test_predictor_tag_ignored_outside_lzw_deflate(self, tmp_path, comp):
        """libtiff applies predictor 2 only inside the LZW/Deflate codecs;
        a tag-317=2 file written uncompressed or PackBits carries
        UNdifferenced pixels and must be read as-is (code-review finding:
        honoring the tag cumsum-corrupted such frames)."""
        from PIL import Image

        arr = np.random.default_rng(9).poisson(300, (21, 17)).astype(np.uint16)
        p = str(tmp_path / "ignored_pred.tif")
        kw = {"compression": comp} if comp else {}
        Image.fromarray(arr).save(p, tiffinfo={317: 2}, **kw)
        with tiff.TiffReader(p) as r:
            np.testing.assert_array_equal(r.read_frame(0), arr)

    def test_lazy_reader_rejects_unknown_compression(self, tmp_path):
        """Unsupported compression (e.g. JPEG-in-TIFF, tag value 7) raises
        ValueError so callers take the read_stack/PIL fallback."""
        arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
        p = str(tmp_path / "weird.tif")
        tiff.write_stack(p, arr)
        raw = bytearray(open(p, "rb").read())
        # tag 259 (compression) SHORT value: find the IFD entry and patch it
        idx = raw.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
        assert idx > 0
        raw[idx + 8 : idx + 10] = (7).to_bytes(2, "little")  # JPEG
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="compression"):
            tiff.TiffReader(p)

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
    def test_deflate_write_round_trip(self, tmp_path, dtype):
        """Deflate output: smaller for label-like data, read back exactly by
        our reader AND by PIL/libtiff (ImageJ-compatible Adobe deflate)."""
        from PIL import Image

        rng = np.random.default_rng(4)
        stack = rng.poisson(2, (4, 48, 56)).astype(dtype)  # sparse, label-ish
        p = str(tmp_path / "z.tif")
        p_raw = str(tmp_path / "raw.tif")
        tiff.write_stack(p, stack, compression="deflate")
        tiff.write_stack(p_raw, stack)
        assert os.path.getsize(p) < os.path.getsize(p_raw) // 2
        back = tiff.read_stack(p)
        assert back.dtype == stack.dtype
        np.testing.assert_array_equal(back, stack)
        img = Image.open(p)
        pil = np.stack(
            [(img.seek(i), np.asarray(img))[1] for i in range(img.n_frames)]
        )
        np.testing.assert_array_equal(pil, stack)

    def test_deflate_append_bit_identical_to_bulk(self, tmp_path):
        stack = np.random.default_rng(5).poisson(3, (3, 20, 24)).astype(np.uint16)
        p_bulk = str(tmp_path / "bulk.tif")
        p_inc = str(tmp_path / "inc.tif")
        tiff.write_stack(p_bulk, stack, compression="deflate")
        with tiff.TiffAppendWriter(p_inc, compression="deflate") as w:
            for frame in stack:
                w.append(frame)
        with open(p_bulk, "rb") as a, open(p_inc, "rb") as b:
            assert a.read() == b.read()

    def test_writer_rejects_unknown_compression(self, tmp_path):
        with pytest.raises(ValueError, match="compression"):
            tiff.TiffAppendWriter(str(tmp_path / "x.tif"), compression="lzw")
        assert not os.path.exists(str(tmp_path / "x.tif.tmp"))

    @pytest.mark.parametrize("dtype", [np.uint16, np.float32])
    def test_append_writer_bit_identical_to_write_stack(self, tmp_path, dtype):
        stack = (np.random.default_rng(1).random((5, 20, 28)) * 99).astype(dtype)
        p_bulk = str(tmp_path / "bulk.tif")
        p_inc = str(tmp_path / "inc.tif")
        tiff.write_stack(p_bulk, stack)
        with tiff.TiffAppendWriter(p_inc) as w:
            for frame in stack:
                w.append(frame)
        with open(p_bulk, "rb") as a, open(p_inc, "rb") as b:
            assert a.read() == b.read()

    def test_append_writer_atomic(self, tmp_path):
        p = str(tmp_path / "out.tif")
        w = tiff.TiffAppendWriter(p)
        w.append(np.zeros((8, 8), np.uint16))
        assert not os.path.exists(p)  # only the .tmp exists while streaming
        w.close()
        assert os.path.exists(p) and not os.path.exists(p + ".tmp")

    def test_append_writer_abort_removes_tmp(self, tmp_path):
        p = str(tmp_path / "out.tif")
        with pytest.raises(RuntimeError):
            with tiff.TiffAppendWriter(p) as w:
                w.append(np.zeros((8, 8), np.uint16))
                raise RuntimeError("job died mid-stream")
        assert not os.path.exists(p) and not os.path.exists(p + ".tmp")

    def test_append_writer_empty_raises(self, tmp_path):
        p = str(tmp_path / "never.tif")
        w = tiff.TiffAppendWriter(p)
        with pytest.raises(ValueError):
            w.close()
        assert not os.path.exists(p) and not os.path.exists(p + ".tmp")

    @pytest.mark.parametrize("dtype", [np.int16, np.int32])
    def test_signed_int_roundtrip(self, tmp_path, dtype):
        # externally-produced label maps are often signed ints
        stack = np.arange(2 * 8 * 8, dtype=dtype).reshape(2, 8, 8) - 5
        p = str(tmp_path / "si.tif")
        tiff.write_stack(p, stack)
        np.testing.assert_array_equal(tiff.read_stack(p), stack)
        with tiff.TiffReader(p) as r:
            np.testing.assert_array_equal(r.read_frame(1), stack[1])

    def test_unknown_dtype_raises_valueerror_not_keyerror(self, tmp_path):
        """The lazy reader's fallback contract is ValueError; an exotic
        dtype tag (float64 SampleFormat) must not leak a KeyError that
        the server would classify as retryable (code-review r3)."""
        p = str(tmp_path / "weird.tif")
        frame = np.zeros((4, 4), np.float32)
        tiff.write_stack(p, frame)
        # corrupt BitsPerSample to an unsupported (24, 1) combination
        with open(p, "r+b") as f:
            buf = bytearray(f.read())
            # IFD at 8; entry 2 (BitsPerSample) value at 8+2+2*12+8
            off = 8 + 2 + 2 * 12 + 8
            buf[off:off + 2] = (24).to_bytes(2, "little")
            f.seek(0)
            f.write(buf)
        with pytest.raises(ValueError):
            tiff.TiffReader(p)

    def test_inline_short_strip_entries(self, tmp_path):
        """TIFF6 stores values of <= 4 bytes INLINE: a two-strip page with
        SHORT-typed StripOffsets/ByteCounts (count=2) must parse, not be
        misread as an offset (code-review r3)."""
        import struct

        h, w = 2, 4
        rows = np.arange(h * w, dtype=np.uint8).reshape(h, w)
        # hand-build: header + one IFD with SHORT count=2 strip entries
        n_entries = 8
        ifd_start = 8
        data_offset = ifd_start + 2 + n_entries * 12 + 4
        strip0, strip1 = data_offset, data_offset + w  # one row per strip

        def entry(tag, typ, count, raw4):
            return struct.pack("<HHI4s", tag, typ, count, raw4)

        short1 = lambda v: struct.pack("<HH", v, 0)
        short2 = lambda a, b: struct.pack("<HH", a, b)
        long1 = lambda v: struct.pack("<I", v)
        entries = [
            entry(256, 3, 1, short1(w)),
            entry(257, 3, 1, short1(h)),
            entry(258, 3, 1, short1(8)),
            entry(259, 3, 1, short1(1)),
            entry(262, 3, 1, short1(1)),
            entry(273, 3, 2, short2(strip0, strip1)),  # inline SHORT x2
            entry(278, 4, 1, long1(1)),  # one row per strip
            entry(279, 3, 2, short2(w, w)),  # inline SHORT x2
        ]
        p = str(tmp_path / "strips.tif")
        with open(p, "wb") as f:
            f.write(b"II" + struct.pack("<HI", 42, 8))
            f.write(struct.pack("<H", n_entries))
            f.write(b"".join(entries))
            f.write(struct.pack("<I", 0))
            f.write(rows.tobytes())
        np.testing.assert_array_equal(tiff.read_stack(p), rows)
        with tiff.TiffReader(p) as r:
            np.testing.assert_array_equal(r.read_frame(0), rows)

    def test_append_writer_4gib_guard(self, tmp_path):
        """Past the classic-TIFF 32-bit offset limit the writer fails with
        a clear ValueError, not a struct.error hours into a stream."""
        p = str(tmp_path / "big.tif")
        w = tiff.TiffAppendWriter(p)
        w.append(np.zeros((4, 4), np.uint16))
        w._offset = 0xFFFFFFF0  # simulate ~4 GiB written
        with pytest.raises(ValueError, match="4 GiB"):
            w.append(np.zeros((4, 4), np.uint16))
        w.abort()

    def test_frame_source_preserves_native_dtype(self, tmp_path):
        stack = (np.random.default_rng(0).random((3, 8, 8)) * 900).astype(
            np.uint16
        )
        p = str(tmp_path / "u16.tif")
        tiff.write_stack(p, stack)
        from sequitr_tpu.data.source import FrameSource

        with FrameSource(paths=[p]) as src:
            # dtype is known from the header, no frame decode needed
            assert src.dtype == np.uint16
            f = src.frame(1)
            assert f.dtype == np.uint16  # 2-byte pixels ship to the device
            np.testing.assert_array_equal(f, stack[1])

    def test_frame_source_dtype_promotes_mixed_channels(self, tmp_path):
        """Multi-channel frames np.stack, so .dtype reports the promoted
        type the consumer will actually see."""
        from sequitr_tpu.data.source import FrameSource

        a = np.zeros((2, 4, 4), np.uint16)
        b = np.zeros((2, 4, 4), np.float32)
        tiff.write_stack(str(tmp_path / "a.tif"), a)
        tiff.write_stack(str(tmp_path / "b.tif"), b)
        with FrameSource(
            paths=[str(tmp_path / "a.tif"), str(tmp_path / "b.tif")]
        ) as src:
            assert src.dtype == np.float32
            assert src.frame(0).dtype == src.dtype
        # array mode (no readers) reports the array's dtype
        with FrameSource(array=a) as src:
            assert src.dtype == np.uint16

    def test_frame_sequence_directory_natural_order(self, tmp_path):
        """A directory of per-frame files (the ImageJ/Micro-Manager export
        convention) serves as one timelapse, ordered img_2 before img_10."""
        from sequitr_tpu.data.source import FrameSource

        rng = np.random.default_rng(1)
        d = tmp_path / "seq"
        d.mkdir()
        frames = [
            (rng.random((9, 11)) * 900).astype(np.uint16) for _ in range(12)
        ]
        for i, f in enumerate(frames):
            tiff.write_stack(str(d / f"img_{i}.tif"), f)  # NO zero padding
        with FrameSource(paths=[str(d)]) as src:
            assert src.n_frames == 12
            assert src.spatial == (9, 11)
            for t in range(12):
                np.testing.assert_array_equal(src.frame(t), frames[t])

    def test_frame_sequence_glob_mixed_pages_fd_cap(self, tmp_path):
        """Glob expansion; files may hold >1 page (concatenated along T);
        the open-reader LRU keeps the fd count bounded for long sequences."""
        from sequitr_tpu.data.source import FrameSource, _SequenceReader

        rng = np.random.default_rng(2)
        d = tmp_path / "mix"
        d.mkdir()
        stacks = [
            (rng.random((n, 6, 7)) * 99).astype(np.float32)
            for n in (1, 3, 2)
        ]
        for i, s in enumerate(stacks):
            tiff.write_stack(str(d / f"part{i}.tif"), s)
        ref = np.concatenate(stacks)
        with FrameSource(paths=[str(d / "part*.tif")]) as src:
            assert src.n_frames == 6
            got = np.stack(list(src.frames()))
        np.testing.assert_array_equal(got, ref)
        # fd cap: more files than _MAX_OPEN, all frames still readable
        d2 = tmp_path / "many"
        d2.mkdir()
        n_files = _SequenceReader._MAX_OPEN + 5
        for i in range(n_files):
            tiff.write_stack(
                str(d2 / f"f{i:03d}.tif"),
                np.full((4, 4), i, dtype=np.uint16),
            )
        r = _SequenceReader(
            [str(d2 / f"f{i:03d}.tif") for i in range(n_files)]
        )
        assert len(r._live) <= r._MAX_OPEN
        for i in range(n_files):
            assert int(r.read_frame(i)[0, 0]) == i
            assert len(r._live) <= r._MAX_OPEN
        r.close()
        assert not r._live

    def test_frame_sequence_multi_directory_glob_order(self, tmp_path):
        """pos*/img.tif-style globs (identical basenames, one directory per
        timepoint — the Micro-Manager layout) must order by the FULL path
        naturally: pos2 before pos10 (code-review finding: a basename-only
        key left filesystem order)."""
        from sequitr_tpu.data.source import FrameSource

        d = tmp_path / "mm"
        d.mkdir()
        order = [1, 2, 10, 11]
        for i in order:
            (d / f"pos{i}").mkdir()
            tiff.write_stack(
                str(d / f"pos{i}" / "img.tif"),
                np.full((4, 4), i, dtype=np.uint16),
            )
        with FrameSource(paths=[str(d / "pos*" / "img.tif")]) as src:
            got = [int(f[0, 0]) for f in src.frames()]
        assert got == order

    def test_frame_sequence_shape_mismatch_raises(self, tmp_path):
        from sequitr_tpu.data.source import FrameSource

        d = tmp_path / "bad"
        d.mkdir()
        tiff.write_stack(str(d / "a.tif"), np.zeros((4, 4), np.uint16))
        tiff.write_stack(str(d / "b.tif"), np.zeros((5, 5), np.uint16))
        with pytest.raises(ValueError, match="disagree"):
            FrameSource(paths=[str(d)])
        with pytest.raises(ValueError, match="no .tif"):
            empty = tmp_path / "empty"
            empty.mkdir()
            FrameSource(paths=[str(empty)])
        with pytest.raises(ValueError, match="glob matched no files"):
            FrameSource(paths=[str(tmp_path / "nope_*.tif")])

    @pytest.mark.parametrize("dtype", [np.uint16, np.float32])
    def test_bigtiff_roundtrip(self, tmp_path, dtype):
        """BigTIFF (version 43, 8-byte offsets) round-trips through both
        readers — the streaming writers' format past the 4 GiB limit."""
        stack = (np.random.default_rng(2).random((4, 20, 28)) * 99).astype(
            dtype
        )
        p = str(tmp_path / "big.tif")
        with tiff.TiffAppendWriter(p, bigtiff=True) as w:
            for frame in stack:
                w.append(frame)
        with open(p, "rb") as f:
            assert f.read(4)[2:4] == (43).to_bytes(2, "little")  # version 43
        with tiff.TiffReader(p) as r:
            assert r.shape == (4, 20, 28)
            np.testing.assert_array_equal(np.stack(list(r)), stack)
        np.testing.assert_array_equal(tiff.read_stack(p), stack)

    def test_bigtiff_offsets_past_4gib_pack(self, tmp_path):
        # the 8-byte offset field accepts positions beyond 2^32 (the
        # classic writer raises there — tested above)
        p = str(tmp_path / "huge.tif")
        w = tiff.TiffAppendWriter(p, bigtiff=True)
        w.append(np.zeros((4, 4), np.uint16))
        w._offset = 0x1_0000_0010
        w.append(np.zeros((4, 4), np.uint16))  # must not raise
        w.abort()

    def test_append_writer_size_policy(self):
        from sequitr_tpu.server.server import _append_writer

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            small = _append_writer(os.path.join(d, "s.tif"), 1e9)
            big = _append_writer(os.path.join(d, "b.tif"), 6e9)
            assert not small.bigtiff and big.bigtiff
            small.abort()
            big.abort()

    def test_mixed_dtypes_per_page(self, tmp_path):
        # each page carries its own dtype tags; the reader honors them
        p = str(tmp_path / "mix.tif")
        a = np.arange(64, dtype=np.uint16).reshape(8, 8)
        b = (np.random.default_rng(0).random((8, 8))).astype(np.float32)
        with tiff.TiffAppendWriter(p) as w:
            w.append(a)
            w.append(b)
        with tiff.TiffReader(p) as r:
            np.testing.assert_array_equal(r.read_frame(0), a)
            np.testing.assert_array_equal(r.read_frame(1), b)


class TestRecords:
    def test_crc32c_known_vector(self):
        # RFC 3720 test vector
        assert records.crc32c(b"123456789") == 0xE3069283
        assert records.crc32c(b"") == 0

    def test_native_crc_matches_python(self):
        data = np.random.default_rng(0).bytes(10000)
        assert records.crc32c(data) == native.crc32c(data)

    def test_example_encode_decode(self):
        feats = {
            "img": b"\x00\x01\x02",
            "shape": [3, 4, 5],
            "scale": [1.5, 2.5],
            "name": b"hello",
        }
        out = records.decode_example(records.encode_example(feats))
        assert out["img"] == [b"\x00\x01\x02"]
        assert out["shape"] == [3, 4, 5]
        np.testing.assert_allclose(out["scale"], [1.5, 2.5])
        assert out["name"] == [b"hello"]

    def test_record_framing_roundtrip(self, tmp_path):
        p = str(tmp_path / "r.tfrecord")
        payloads = [b"a" * 10, b"b" * 1000, b""]
        with records.RecordWriter(p) as w:
            for pl in payloads:
                w.write(pl)
        assert list(records.read_records(p)) == payloads

    def test_gzip_records_roundtrip_and_sniff(self, tmp_path):
        """GZIP shards (TF's compression_type='GZIP' layout) round-trip;
        the reader sniffs the layout from the magic bytes, no flag."""
        p = str(tmp_path / "g.tfrecord")
        payloads = [b"x" * 500, b"y" * 500, b""]
        with records.RecordWriter(p, compression="gzip") as w:
            for pl in payloads:
                w.write(pl)
        with open(p, "rb") as f:
            assert f.read(2) == b"\x1f\x8b"
        assert list(records.read_records(p)) == payloads
        # corruption inside the framed stream still raises through gzip
        import gzip as _gzip

        inner = bytearray(_gzip.decompress(open(p, "rb").read()))
        inner[9] ^= 0xFF  # payload byte of the first record
        open(p, "wb").write(_gzip.compress(bytes(inner)))
        with pytest.raises(IOError):
            list(records.read_records(p))

    def test_gzip_sniff_not_fooled_by_record_length(self, tmp_path):
        """An UNCOMPRESSED shard whose first record is 35615 bytes starts
        with the gzip magic (little-endian length field = 1f 8b); the
        sniff must validate the plain-TFRecord header crc first
        (code-review finding: the 2-byte sniff crashed on valid data)."""
        p = str(tmp_path / "fooled.tfrecord")
        payloads = [b"q" * 0x8B1F, b"tail"]
        with records.RecordWriter(p) as w:
            for pl in payloads:
                w.write(pl)
        with open(p, "rb") as f:
            assert f.read(2) == b"\x1f\x8b"  # the trap is armed
        assert list(records.read_records(p)) == payloads

    def test_gzip_segmentation_shards_readable(self, tmp_path):
        rng = np.random.default_rng(3)
        exs = [
            records.SegExample(
                rng.random((8, 8)).astype(np.float32),
                rng.integers(0, 3, (8, 8)),
            )
            for _ in range(5)
        ]
        paths = records.write_segmentation_shards(
            str(tmp_path / "gz"), iter(exs), shard_size=2, compression="gzip"
        )
        back = list(records.read_segmentation_examples(paths))
        assert len(back) == 5
        for a, b in zip(exs, back):
            np.testing.assert_array_equal(a.image, b.image)
            np.testing.assert_array_equal(a.labels, b.labels)

    def test_corruption_detected(self, tmp_path):
        p = str(tmp_path / "r.tfrecord")
        with records.RecordWriter(p) as w:
            w.write(b"hello world payload")
        raw = bytearray(open(p, "rb").read())
        raw[-6] ^= 0xFF  # flip a payload byte
        open(p, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            list(records.read_records(p))

    def test_segmentation_shards(self, tmp_path):
        rng = np.random.default_rng(0)
        exs = [
            records.SegExample(
                rng.random((8, 8)).astype(np.float32),
                rng.integers(0, 3, (8, 8)),
                rng.random((8, 8)).astype(np.float32),
            )
            for _ in range(7)
        ]
        paths = records.write_segmentation_shards(
            str(tmp_path / "train"), exs, shard_size=3
        )
        assert len(paths) == 3
        back = list(records.read_segmentation_examples(paths))
        assert len(back) == 7
        np.testing.assert_array_equal(back[2].image, exs[2].image)
        np.testing.assert_array_equal(back[2].labels, exs[2].labels)
        np.testing.assert_array_equal(back[2].weights, exs[2].weights)


class TestNative:
    def test_build_and_label(self):
        assert native.build()
        mask = np.zeros((32, 32), bool)
        mask[2:8, 2:8] = True
        mask[20:30, 5:25] = True
        mask[0, 31] = True
        lab = native.label_components(mask)
        assert lab.max() == 3
        from scipy import ndimage

        ref, n = ndimage.label(mask)
        assert n == 3
        # same partition (labels may be permuted)
        for i in range(1, 4):
            region = lab == i
            assert len(np.unique(ref[region])) == 1

    def test_label_full_stats_native_matches_scipy(self):
        """The single-pass C++ stats (area/centroid/intensity/majority
        class) agree exactly with the four-pass scipy fallback."""
        rng = np.random.default_rng(0)
        cm = rng.integers(0, 4, size=(64, 64)).astype(np.int32)
        inten = rng.random((64, 64)).astype(np.float32)
        inst = native.label_components(cm > 0)
        n = int(inst.max())
        assert n > 0
        nat = native.label_full_stats(inst, cm, inten, n, 4)
        # force the scipy fallback on the same inputs
        saved_lib, saved_failed = native._lib, native._build_failed
        try:
            native._lib, native._build_failed = None, True
            ref = native.label_full_stats(inst, cm, inten, n, 4)
        finally:
            native._lib, native._build_failed = saved_lib, saved_failed
        np.testing.assert_array_equal(nat[0], ref[0])  # areas
        np.testing.assert_allclose(nat[1], ref[1], atol=1e-9)  # cy
        np.testing.assert_allclose(nat[2], ref[2], atol=1e-9)  # cx
        np.testing.assert_allclose(nat[3], ref[3], atol=1e-6)  # imean
        np.testing.assert_array_equal(nat[4], ref[4])  # majority class

    def test_label_full_stats_simple_square(self):
        cm = np.zeros((16, 16), np.int32)
        cm[4:8, 4:8] = 2
        inst = native.label_components(cm > 0)
        areas, cy, cx, imean, cls = native.label_full_stats(
            inst, cm, None, 1, 3
        )
        assert areas[0] == 16
        np.testing.assert_allclose([cy[0], cx[0]], [5.5, 5.5])
        assert cls[0] == 2 and imean[0] == 0.0

    def test_label_full_stats_3d_native_matches_scipy(self):
        from scipy import ndimage

        rng = np.random.default_rng(1)
        cm = rng.integers(0, 3, size=(8, 16, 16)).astype(np.int32)
        inten = rng.random((8, 16, 16)).astype(np.float32)
        inst, n = ndimage.label(
            cm > 0, structure=ndimage.generate_binary_structure(3, 1)
        )
        assert n > 0
        nat = native.label_full_stats_3d(inst, cm, inten, n, 3)
        saved_lib, saved_failed = native._lib, native._build_failed
        try:
            native._lib, native._build_failed = None, True
            ref = native.label_full_stats_3d(inst, cm, inten, n, 3)
        finally:
            native._lib, native._build_failed = saved_lib, saved_failed
        np.testing.assert_array_equal(nat[0], ref[0])  # areas
        for i in (1, 2, 3):  # cz, cy, cx
            np.testing.assert_allclose(nat[i], ref[i], atol=1e-9)
        np.testing.assert_allclose(nat[4], ref[4], atol=1e-6)  # imean
        np.testing.assert_array_equal(nat[5], ref[5])  # majority class

    def test_snake_pattern(self):
        # worst case for union-find: serpentine requiring many merges
        mask = np.zeros((16, 16), bool)
        mask[::2, :] = True
        mask[1::2, 0] = True  # connect rows on the left edge
        lab = native.label_components(mask)
        assert lab.max() == 1

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_lzw_native_matches_python(self, tmp_path, dtype):
        """The C++ LZW decoder (the compressed-ingest hot path, ~100x the
        Python form) produces byte-identical strips on libtiff output —
        including multi-strip pages and the KwKwK code case that repeated
        data provokes."""
        from PIL import Image

        from sequitr_tpu.data import tiff
        from sequitr_tpu.data.tiff import _lzw_decode

        rng = np.random.default_rng(7)
        # low-entropy block structure maximizes dictionary reuse (KwKwK)
        arr = np.repeat(
            np.repeat(rng.integers(0, 9, (20, 26)), 7, axis=0), 7, axis=1
        ).astype(dtype)
        p = str(tmp_path / "l.tif")
        Image.fromarray(arr).save(p, compression="tiff_lzw")
        with tiff.TiffReader(p) as r:
            np.testing.assert_array_equal(r.read_frame(0), arr)
            h, w, dt, offs, counts, comp, pred, rps = r._frames[0]
            fd = r._f.fileno()
            for i, (o, c) in enumerate(zip(offs, counts)):
                strip = os.pread(fd, c, o)
                exp = min(rps, h - i * rps) * w * dt.itemsize
                nat = native.lzw_decode(strip, exp)
                assert nat is not None  # toolchain exists in CI
                assert nat == _lzw_decode(strip)[:exp]

    def test_lzw_native_rejects_corrupt(self):
        # a code far beyond the table must raise, not scribble or hang
        bad = b"\x80\x00\xff\xff\xff\xff\xff\xff"
        with pytest.raises(ValueError):
            native.lzw_decode(bad, 100)
        # truncated stream: decodes short of `expected` -> ValueError
        with pytest.raises(ValueError):
            native.lzw_decode(b"\x80\x00\x40", 4096)


class TestPrefetch:
    def test_batch_iterator(self):
        exs = [{"x": np.full((2,), i)} for i in range(10)]
        batches = list(batch_iterator(exs, 4))
        assert len(batches) == 2  # drop remainder
        assert batches[0]["x"].shape == (4, 2)

    def test_prefetch_preserves_order_and_values(self):
        items = [{"x": np.full((3,), i)} for i in range(6)]
        out = list(prefetch_to_device(iter(items), depth=3))
        assert len(out) == 6
        for i, o in enumerate(out):
            np.testing.assert_array_equal(np.asarray(o["x"]), items[i]["x"])


class TestFrameSourceCrop:
    def test_crop_views_region(self, tmp_path):
        from sequitr_tpu.data import tiff
        from sequitr_tpu.data.source import FrameSource

        rng = np.random.default_rng(3)
        stack = rng.random((4, 32, 40)).astype(np.float32)
        p = str(tmp_path / "c.tif")
        tiff.write_stack(p, stack)
        with FrameSource(paths=[p]).crop(4, 6, 20, 30) as src:
            assert src.spatial == (16, 24)
            np.testing.assert_array_equal(
                src.frame(2), stack[2, 4:20, 6:30]
            )
            # chunks and frame_range compose with the crop
            src.select(1, 3)
            chunk = next(iter(src.chunks(2)))
            assert chunk.shape == (2, 16, 24)
            np.testing.assert_array_equal(chunk[0], stack[1, 4:20, 6:30])

    def test_crop_multichannel_and_array(self, tmp_path):
        from sequitr_tpu.data import tiff
        from sequitr_tpu.data.source import FrameSource

        rng = np.random.default_rng(4)
        a = rng.random((3, 16, 16)).astype(np.float32)
        b = rng.random((3, 16, 16)).astype(np.float32)
        pa, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
        tiff.write_stack(pa, a)
        tiff.write_stack(pb, b)
        with FrameSource(paths=[pa, pb]).crop(2, 3, 10, 12) as src:
            f = src.frame(1)
            assert f.shape == (8, 9, 2)
            np.testing.assert_array_equal(f[..., 0], a[1, 2:10, 3:12])
        src2 = FrameSource(array=a).crop(0, 0, 8, 8)
        np.testing.assert_array_equal(src2.frame(0), a[0, :8, :8])

    def test_crop_bounds_validated(self):
        from sequitr_tpu.data.source import FrameSource

        src = FrameSource(array=np.zeros((2, 16, 16), np.float32))
        import pytest as _pytest

        for bad in [(0, 0, 17, 16), (-1, 0, 8, 8), (8, 0, 8, 8)]:
            with _pytest.raises(ValueError, match="roi"):
                src.crop(*bad)


class TestTiffMalformed:
    """Corrupt/forged TIFFs must surface as ValueError — the codec
    contract callers (FrameSource, server lazy readers) key their
    fallback and deterministic JobErrors on. Never a hang (cyclic IFD
    chains), never a forged-size allocation (strip counts / claimed
    dimensions beyond the file), never a foreign exception type."""

    def _valid_bytes(self, tmp_path, frames=3, compression="none"):
        import struct

        path = str(tmp_path / "ok.tif")
        stack = (
            np.arange(frames * 16 * 16, dtype=np.uint16)
            .reshape(frames, 16, 16)
        )
        tiff.write_stack(path, stack, compression=compression)
        return path, bytearray(open(path, "rb").read()), struct

    def _ifd_offsets(self, raw, struct):
        """Walk the classic-TIFF IFD chain, returning each IFD's offset
        and the file position of its next-IFD pointer."""
        out = []
        ifd = struct.unpack_from("<I", raw, 4)[0]
        while ifd:
            n = struct.unpack_from("<H", raw, ifd)[0]
            nptr = ifd + 2 + n * 12
            out.append((ifd, nptr))
            ifd = struct.unpack_from("<I", raw, nptr)[0]
        return out

    def _entry_pos(self, raw, ifd, tag, struct):
        """File position of ``tag``'s 12-byte entry within the IFD."""
        n = struct.unpack_from("<H", raw, ifd)[0]
        for j in range(n):
            e = ifd + 2 + j * 12
            if struct.unpack_from("<H", raw, e)[0] == tag:
                return e
        raise AssertionError(f"tag {tag} not in IFD")

    def test_cyclic_ifd_chain_rejected(self, tmp_path):
        """A next-IFD pointer aimed backward must error, not loop the
        parse forever while the frame table grows without bound."""
        path, raw, struct = self._valid_bytes(tmp_path)
        chain = self._ifd_offsets(raw, struct)
        first_ifd = chain[0][0]
        last_nptr = chain[-1][1]
        struct.pack_into("<I", raw, last_nptr, first_ifd)
        bad = str(tmp_path / "cyclic.tif")
        open(bad, "wb").write(raw)
        with pytest.raises(ValueError, match="cyclic"):
            tiff.TiffReader(bad)

    def test_self_pointing_ifd_rejected(self, tmp_path):
        path, raw, struct = self._valid_bytes(tmp_path)
        (first_ifd, nptr), *_ = self._ifd_offsets(raw, struct)
        struct.pack_into("<I", raw, nptr, first_ifd)
        bad = str(tmp_path / "selfloop.tif")
        open(bad, "wb").write(raw)
        with pytest.raises(ValueError, match="cyclic"):
            tiff.TiffReader(bad)

    def test_forged_strip_count_rejected(self, tmp_path):
        """A strip byte count beyond the file must fail at PARSE time —
        read_frame's os.pread would allocate the claimed size up front."""
        path, raw, struct = self._valid_bytes(tmp_path)
        (ifd, _), *_ = self._ifd_offsets(raw, struct)
        e = self._entry_pos(raw, ifd, 279, struct)  # StripByteCounts
        struct.pack_into("<I", raw, e + 8, 0x7FFFFFFF)
        bad = str(tmp_path / "forged.tif")
        open(bad, "wb").write(raw)
        with pytest.raises(ValueError, match="outside the file"):
            tiff.TiffReader(bad)

    def test_zero_dimensions_rejected(self, tmp_path):
        path, raw, struct = self._valid_bytes(tmp_path)
        (ifd, _), *_ = self._ifd_offsets(raw, struct)
        e = self._entry_pos(raw, ifd, 256, struct)  # ImageWidth
        struct.pack_into("<I", raw, e + 8, 0)
        bad = str(tmp_path / "zerodim.tif")
        open(bad, "wb").write(raw)
        with pytest.raises(ValueError, match="dimensions"):
            tiff.TiffReader(bad)

    def test_forged_dimensions_on_compressed_rejected(self, tmp_path):
        """Claimed decompressed size wildly beyond the compressed payload
        must fail at parse, not allocate the claimed buffer."""
        path, raw, struct = self._valid_bytes(tmp_path, compression="deflate")
        (ifd, _), *_ = self._ifd_offsets(raw, struct)
        e = self._entry_pos(raw, ifd, 257, struct)  # ImageLength
        struct.pack_into("<I", raw, e + 8, 1 << 30)
        bad = str(tmp_path / "bomb.tif")
        open(bad, "wb").write(raw)
        with pytest.raises(ValueError, match="implausible|outside"):
            with tiff.TiffReader(bad) as r:
                r.read_frame(0)

    def test_corrupt_deflate_strip_is_valueerror(self, tmp_path):
        """zlib's own exception type must not leak through read_frame."""
        path, raw, struct = self._valid_bytes(tmp_path, compression="deflate")
        with tiff.TiffReader(path) as r:
            off = r._frames[0][3][0]  # first strip offset
        raw[off : off + 8] = b"\xff" * 8
        bad = str(tmp_path / "zbad.tif")
        open(bad, "wb").write(raw)
        with tiff.TiffReader(bad) as r:
            with pytest.raises(ValueError):
                r.read_frame(0)

    def test_truncated_file(self, tmp_path):
        path, raw, struct = self._valid_bytes(tmp_path)
        bad = str(tmp_path / "trunc.tif")
        open(bad, "wb").write(raw[: int(len(raw) * 0.6)])
        with pytest.raises(ValueError):
            with tiff.TiffReader(bad) as r:
                for t in range(r.n_frames):
                    r.read_frame(t)

    @pytest.mark.parametrize("compression", ["none", "deflate"])
    def test_random_mutation_fuzz(self, tmp_path, compression):
        """Seeded byte-flip fuzz: every mutated file either reads fine or
        raises ValueError — no hangs, no foreign exceptions, no crashes."""
        path, raw, struct = self._valid_bytes(
            tmp_path, frames=2, compression=compression
        )
        rng = np.random.default_rng(42)
        bad = str(tmp_path / "fuzz.tif")
        for i in range(150):
            mut = bytearray(raw)
            for _ in range(int(rng.integers(1, 9))):
                pos = int(rng.integers(0, len(mut)))
                mut[pos] = int(rng.integers(0, 256))
            open(bad, "wb").write(mut)
            try:
                with tiff.TiffReader(bad) as r:
                    for t in range(r.n_frames):
                        r.read_frame(t)
            except ValueError:
                pass  # the contract: corrupt -> ValueError

    def test_read_stack_on_garbage_is_valueerror(self, tmp_path):
        bad = str(tmp_path / "garbage.tif")
        open(bad, "wb").write(b"II*\x00" + bytes(100))
        with pytest.raises(ValueError):
            tiff.read_stack(bad)


class TestRecordsMalformed:
    """Corrupt/forged record shards must surface as IOError (the
    documented shard-corruption type) — never an up-front forged-size
    allocation, a struct.error, or a gzip-layer exception type."""

    def _shard(self, tmp_path, compression=None):
        import struct

        p = str(tmp_path / "s.tfrecord")
        with records.RecordWriter(p, compression=compression) as w:
            for i in range(4):
                w.write(
                    records.encode_example({"x": [float(i)], "n": [i]})
                )
        return p, bytearray(open(p, "rb").read()), struct

    def test_forged_length_fails_before_allocation(self, tmp_path):
        """A forged multi-GB length field must fail at the header crc,
        not allocate the claimed size (read(n) allocates up front)."""
        p, raw, struct = self._shard(tmp_path)
        struct.pack_into("<Q", raw, 0, 1 << 42)  # first record's length
        open(p, "wb").write(raw)
        with pytest.raises(IOError, match="corrupt record header"):
            list(records.read_records(p))

    def test_forged_length_bounded_without_crc(self, tmp_path):
        """verify_crc=False must still refuse reads beyond the file."""
        p, raw, struct = self._shard(tmp_path)
        struct.pack_into("<Q", raw, 0, 1 << 42)
        open(p, "wb").write(raw)
        with pytest.raises(IOError, match="exceeds the file"):
            list(records.read_records(p, verify_crc=False))

    def test_truncated_shard(self, tmp_path):
        p, raw, struct = self._shard(tmp_path)
        open(p, "wb").write(raw[: len(raw) - 6])
        with pytest.raises(IOError):
            list(records.read_records(p))

    def test_corrupt_gzip_stream_is_ioerror(self, tmp_path):
        p, raw, struct = self._shard(tmp_path, compression="gzip")
        raw[len(raw) // 2] ^= 0xFF
        open(p, "wb").write(raw)
        with pytest.raises(IOError):
            list(records.read_records(p))

    @pytest.mark.parametrize("compression", [None, "gzip"])
    def test_random_mutation_fuzz(self, tmp_path, compression):
        """Seeded byte-flip fuzz: every mutated shard reads fine or
        raises IOError/ValueError — no hangs, bombs or foreign types."""
        p, raw, struct = self._shard(tmp_path, compression=compression)
        rng = np.random.default_rng(7)
        bad = str(tmp_path / "bad.tfrecord")
        for i in range(150):
            mut = bytearray(raw)
            for _ in range(int(rng.integers(1, 10))):
                pos = int(rng.integers(0, len(mut)))
                mut[pos] = int(rng.integers(0, 256))
            open(bad, "wb").write(bytes(mut))
            try:
                for payload in records.read_records(bad):
                    records.decode_example(payload)
            except (IOError, ValueError):
                pass
