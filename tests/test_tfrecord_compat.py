"""TFRecord interop: the no-TF reader/writer must be byte- and
value-compatible with the reference's serialization stack
(tf.io.TFRecordWriter + tf.train.Example,
ref: pkg/tfrecord_writer/tfrecord_writer.py:44-126,
pkg/modelling/tfrecord_dataset.py:24-37)."""

import numpy as np
import pandas as pd
import pytest

from hm_retrieval_tpu.data import tfrecord_compat as tfc
from hm_retrieval_tpu.data.dataset import ShardDataset
from hm_retrieval_tpu.data.shard_writer import ShardWriter
from hm_retrieval_tpu.schema.features import (
    Feature,
    FeatureFamily,
    FeatureKind,
)


def make_features():
    cat = Feature(
        name="customer_id",
        kind=FeatureKind.CATEGORICAL,
        family=FeatureFamily.QUERY,
        embedding_size=4,
        vocab=np.array(["c1", "c2", "c3"]),
    )
    num = Feature(
        name="age",
        kind=FeatureKind.NUMERIC,
        family=FeatureFamily.QUERY,
    )
    return [cat, num]


def make_df():
    return pd.DataFrame(
        {
            "customer_id": ["c2", "c1", "zzz", "c3", "c2"],
            "age": [21.0, 35.5, 44.0, 19.25, 60.0],
        }
    )


class TestFraming:
    def test_raw_roundtrip(self, tmp_path):
        payloads = [b"hello", b"", b"x" * 1000, b"\x00\xff" * 7]
        path = str(tmp_path / "t.tfrecord")
        tfc.write_tfrecords(path, payloads)
        assert list(tfc.iter_tfrecords(path)) == payloads

    def test_crc_detects_corruption(self, tmp_path):
        path = str(tmp_path / "t.tfrecord")
        tfc.write_tfrecords(path, [b"payload-bytes"])
        raw = bytearray(open(path, "rb").read())
        raw[14] ^= 0x01  # flip a payload bit
        open(path, "wb").write(bytes(raw))
        with pytest.raises(ValueError):
            list(tfc.iter_tfrecords(path))
        # verify_crc=False must still frame correctly
        got = list(tfc.iter_tfrecords(path, verify_crc=False))
        assert len(got) == 1 and len(got[0]) == len(b"payload-bytes")

    def test_truncated_file_raises(self, tmp_path):
        path = str(tmp_path / "t.tfrecord")
        tfc.write_tfrecords(path, [b"abcdef"])
        raw = open(path, "rb").read()
        open(path, "wb").write(raw[:-3])
        with pytest.raises(ValueError):
            list(tfc.iter_tfrecords(path))

    def test_python_fallback_bytes_identical(
        self, tmp_path, monkeypatch
    ):
        """The pure-Python framing path writes the exact bytes of the
        native path (and both CRC impls agree)."""
        payloads = [b"a", b"bb" * 33, b""]
        p1 = str(tmp_path / "native.tfrecord")
        tfc.write_tfrecords(p1, payloads)
        from hm_retrieval_tpu import native_ext

        monkeypatch.setattr(
            native_ext, "tfrecord_frame", lambda *a, **k: None
        )
        monkeypatch.setattr(
            native_ext, "tfrecord_masked_crc", lambda *a, **k: None
        )
        monkeypatch.setattr(
            native_ext, "tfrecord_scan", lambda *a, **k: None
        )
        p2 = str(tmp_path / "python.tfrecord")
        tfc.write_tfrecords(p2, payloads)
        assert open(p1, "rb").read() == open(p2, "rb").read()
        assert list(tfc.iter_tfrecords(p2)) == payloads


class TestExampleProto:
    def test_roundtrip_all_kinds(self):
        row = {
            "s": [b"tok1", b"tok2"],
            "f": [1.5, -2.25, 0.0],
            "i": [7, -3, 2**40],
        }
        got = tfc.parse_example(tfc.build_example(row))
        assert got["s"] == row["s"]
        assert got["f"] == pytest.approx(row["f"])
        assert got["i"] == row["i"]

    def test_empty_example(self):
        assert tfc.parse_example(tfc.build_example({})) == {}

    def test_str_values_encode_as_bytes(self):
        got = tfc.parse_example(tfc.build_example({"s": ["abc"]}))
        assert got["s"] == [b"abc"]


class TestDataFrameRoundtrip:
    def test_df_to_tfrecord_and_back(self, tmp_path):
        features = make_features()
        df = make_df()
        paths = tfc.dataframe_to_tfrecords(
            df, features, str(tmp_path / "train"), max_rows=2
        )
        assert len(paths) == 3  # 5 rows, 2/shard
        back = tfc.tfrecords_to_dataframe(str(tmp_path), features)
        assert back["customer_id"].tolist() == df[
            "customer_id"
        ].tolist()
        np.testing.assert_allclose(back["age"], df["age"])

    def test_sequence_feature(self, tmp_path):
        seq = Feature(
            name="history",
            kind=FeatureKind.SEQUENCE,
            family=FeatureFamily.QUERY,
            embedding_size=4,
            vocab=np.array(["a1", "a2"]),
            max_len=3,
        )
        df = pd.DataFrame(
            {"history": [["a1", "a2"], [], ["a2", "a2", "a1"]]}
        )
        tfc.dataframe_to_tfrecords(
            df, [seq], str(tmp_path / "seq")
        )
        back = tfc.tfrecords_to_dataframe(str(tmp_path), [seq])
        assert back["history"].tolist() == df["history"].tolist()

    def test_import_matches_direct_shard_write(self, tmp_path):
        """TFRecord -> npz migration must produce exactly the shards
        ShardWriter writes from the same DataFrame."""
        features = make_features()
        df = make_df()
        tfc.dataframe_to_tfrecords(
            df, features, str(tmp_path / "tfr" / "train")
        )
        tfc.import_tfrecords(
            str(tmp_path / "tfr"), features, str(tmp_path / "npz")
        )
        ShardWriter(features).write_shards(
            df, str(tmp_path / "direct")
        )
        got = ShardDataset(str(tmp_path / "npz")).load_all()
        want = ShardDataset(str(tmp_path / "direct")).load_all()
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

    def test_export_decodes_ids(self, tmp_path):
        features = make_features()
        df = make_df()
        ShardWriter(features).write_shards(
            df, str(tmp_path / "npz")
        )
        tfc.export_shards_to_tfrecords(
            str(tmp_path / "npz"),
            features,
            str(tmp_path / "out" / "train"),
        )
        back = tfc.tfrecords_to_dataframe(
            str(tmp_path / "out"), features
        )
        # 'zzz' was OOV at encode time -> decodes to the OOV marker
        want = ["c2", "c1", "<OOV>", "c3", "c2"]
        assert back["customer_id"].tolist() == want


class TestAgainstTensorFlow:
    """Byte-level compatibility with the actual TF stack the reference
    uses (skipped when TF is unavailable)."""

    def test_tf_reads_our_files(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        features = make_features()
        df = make_df()
        paths = tfc.dataframe_to_tfrecords(
            df, features, str(tmp_path / "train")
        )
        ds = tf.data.TFRecordDataset(paths)
        spec = {
            "customer_id": tf.io.FixedLenFeature([1], tf.string),
            "age": tf.io.FixedLenFeature([1], tf.float32),
        }
        rows = [
            tf.io.parse_single_example(r, spec) for r in ds
        ]
        got_ids = [
            r["customer_id"].numpy()[0].decode() for r in rows
        ]
        got_age = [float(r["age"].numpy()[0]) for r in rows]
        assert got_ids == df["customer_id"].tolist()
        assert got_age == pytest.approx(df["age"].tolist())

    def test_we_read_tf_files(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        features = make_features()
        df = make_df()
        path = str(tmp_path / "ref_0.tfrecord")
        with tf.io.TFRecordWriter(path) as w:
            for _, row in df.iterrows():
                ex = tf.train.Example(
                    features=tf.train.Features(
                        feature={
                            "customer_id": tf.train.Feature(
                                bytes_list=tf.train.BytesList(
                                    value=[
                                        row["customer_id"].encode()
                                    ]
                                )
                            ),
                            "age": tf.train.Feature(
                                float_list=tf.train.FloatList(
                                    value=[row["age"]]
                                )
                            ),
                        }
                    )
                )
                w.write(ex.SerializeToString())
        back = tfc.tfrecords_to_dataframe(path, features)
        assert back["customer_id"].tolist() == df[
            "customer_id"
        ].tolist()
        np.testing.assert_allclose(back["age"], df["age"])

    def test_masked_crc_matches_python_reference(self):
        """Golden masked-CRC32C values (computed with the crc32c
        reference implementation) pin the polynomial + mask."""
        # crc32c(b"123456789") == 0xE3069283 -> masked:
        c = 0xE3069283
        masked = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert tfc.masked_crc32c(b"123456789") == masked
