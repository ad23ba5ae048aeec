"""Wire-format compatibility: our TF-free record codec vs real TensorFlow.

The reference's training data lives in TFRecord shards of tf.train.Example
protos (SURVEY.md §2 'TFRecord pipeline'). These tests prove true
interchange: shards written by ``sequitr_tpu.data.records`` parse with
TensorFlow's own readers, and TF-written shards parse with ours. Skipped
cleanly when TF is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from sequitr_tpu.data import records  # noqa: E402


class TestOursToTF:
    def test_tf_reads_our_records_and_examples(self, tmp_path):
        path = str(tmp_path / "ours.tfrecord")
        feats = {
            "image/encoded": b"\x01\x02\x03\x04",
            "image/shape": [2, 2],
            "scales": [1.5, -2.5],
        }
        with records.RecordWriter(path) as w:
            w.write(records.encode_example(feats))
            w.write(records.encode_example({"idx": [7]}))

        ds = list(tf.data.TFRecordDataset([path]))
        assert len(ds) == 2
        ex = tf.train.Example.FromString(ds[0].numpy())
        f = ex.features.feature
        assert f["image/encoded"].bytes_list.value[0] == b"\x01\x02\x03\x04"
        assert list(f["image/shape"].int64_list.value) == [2, 2]
        np.testing.assert_allclose(
            list(f["scales"].float_list.value), [1.5, -2.5]
        )
        ex2 = tf.train.Example.FromString(ds[1].numpy())
        assert list(ex2.features.feature["idx"].int64_list.value) == [7]

    def test_tf_reads_segmentation_shard(self, tmp_path):
        rng = np.random.default_rng(0)
        ex = records.SegExample(
            rng.random((4, 4)).astype(np.float32),
            rng.integers(0, 2, (4, 4)),
            rng.random((4, 4)).astype(np.float32),
        )
        paths = records.write_segmentation_shards(
            str(tmp_path / "seg"), [ex], shard_size=1
        )
        raw = list(tf.data.TFRecordDataset(paths))[0].numpy()
        parsed = tf.io.parse_single_example(
            raw,
            {
                records.K_IMAGE: tf.io.FixedLenFeature([], tf.string),
                records.K_LABELS: tf.io.FixedLenFeature([], tf.string),
                records.K_SHAPE: tf.io.FixedLenFeature([2], tf.int64),
            },
        )
        shape = parsed[records.K_SHAPE].numpy()
        np.testing.assert_array_equal(shape, [4, 4])
        img = np.frombuffer(parsed[records.K_IMAGE].numpy(), "<f4").reshape(4, 4)
        np.testing.assert_array_equal(img, ex.image)


class TestTFToOurs:
    def test_we_read_tf_written_records(self, tmp_path):
        path = str(tmp_path / "tf.tfrecord")
        ex = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "name": tf.train.Feature(
                        bytes_list=tf.train.BytesList(value=[b"cell"])
                    ),
                    "count": tf.train.Feature(
                        int64_list=tf.train.Int64List(value=[42, -1])
                    ),
                    "score": tf.train.Feature(
                        float_list=tf.train.FloatList(value=[0.25])
                    ),
                }
            )
        )
        with tf.io.TFRecordWriter(path) as w:
            w.write(ex.SerializeToString())

        payloads = list(records.read_records(path))
        assert len(payloads) == 1
        out = records.decode_example(payloads[0])
        assert out["name"] == [b"cell"]
        assert out["count"] == [42, -1]  # incl. two's-complement negatives
        np.testing.assert_allclose(out["score"], [0.25])


class TestGzipInterchange:
    """GZIP-compressed shards (TFRecordOptions compression_type='GZIP')
    interchange both ways — the other common on-disk layout."""

    def test_tf_reads_our_gzip_records(self, tmp_path):
        path = str(tmp_path / "ours_gz.tfrecord")
        with records.RecordWriter(path, compression="gzip") as w:
            w.write(records.encode_example({"idx": [3]}))
            w.write(records.encode_example({"idx": [4]}))
        ds = list(tf.data.TFRecordDataset([path], compression_type="GZIP"))
        vals = [
            list(
                tf.train.Example.FromString(r.numpy())
                .features.feature["idx"].int64_list.value
            )
            for r in ds
        ]
        assert vals == [[3], [4]]

    def test_we_read_tf_gzip_records(self, tmp_path):
        path = str(tmp_path / "tf_gz.tfrecord")
        ex = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "n": tf.train.Feature(
                        int64_list=tf.train.Int64List(value=[9])
                    )
                }
            )
        )
        opts = tf.io.TFRecordOptions(compression_type="GZIP")
        with tf.io.TFRecordWriter(path, opts) as w:
            w.write(ex.SerializeToString())
            w.write(ex.SerializeToString())
        payloads = list(records.read_records(path))
        assert len(payloads) == 2
        assert records.decode_example(payloads[0])["n"] == [9]
