"""Image extension types (lance_spark.arrow — reference lance/arrow.py):
uri → encoded → tensor → encoded roundtrip through the PPM/BMP codecs,
plus ingest unwrap into a Spark dataset."""

import numpy as np
import pyarrow as pa
import pytest

import lance_spark as ls
from lance_spark.arrow import (
    EncodedImageArray,
    EncodedImageType,
    FixedShapeImageTensorType,
    ImageURIArray,
    ImageURIType,
)


def _ppm_bytes(w, h, seed=0):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return b"P6 " + f"{w} {h} 255\n".encode() + px.tobytes(), px


def test_encoded_to_tensor_and_back():
    b1, px1 = _ppm_bytes(4, 3, 1)
    b2, px2 = _ppm_bytes(4, 3, 2)
    arr = pa.ExtensionArray.from_storage(EncodedImageType(), pa.array([b1, b2], pa.binary()))
    tensors = arr.to_tensor()
    assert tensors.type.shape == (3, 4, 3)
    got = tensors.to_numpy()
    assert got.shape == (2, 3, 4, 3)
    assert (got[0] == px1).all() and (got[1] == px2).all()
    # re-encode → decode is lossless
    again = tensors.to_encoded().to_tensor().to_numpy()
    assert (again == got).all()


def test_uri_array_reads_files(tmp_path):
    b1, px1 = _ppm_bytes(2, 2, 7)
    p = tmp_path / "img.ppm"
    p.write_bytes(b1)
    uris = ImageURIArray.from_uris([f"file://{p}", str(p)])
    assert uris.type == ImageURIType()
    enc = uris.read_uris()
    t = enc.to_tensor().to_numpy()
    assert t.shape == (2, 2, 2, 3)
    assert (t[0] == px1).all() and (t[1] == px1).all()


def test_tensor_type_roundtrip_serialization():
    t = FixedShapeImageTensorType(pa.uint8(), (5, 6, 3))
    import pickle

    t2 = pickle.loads(pickle.dumps(t))
    assert t2.shape == (5, 6, 3)
    assert t2.storage_type == pa.list_(pa.uint8(), 90)


def test_mixed_shapes_rejected():
    b1, _ = _ppm_bytes(2, 2)
    b2, _ = _ppm_bytes(3, 2)
    arr = pa.ExtensionArray.from_storage(EncodedImageType(), pa.array([b1, b2], pa.binary()))
    with pytest.raises(ValueError, match="mixed shapes"):
        arr.to_tensor()
    bad = pa.ExtensionArray.from_storage(
        EncodedImageType(), pa.array([b"JPEGnope"], pa.binary())
    )
    with pytest.raises(ValueError, match="unsupported codec"):
        bad.to_tensor()


def test_ingest_unwraps_extension_types(spark, tmp_path):
    b1, _ = _ppm_bytes(2, 2, 3)
    enc = pa.ExtensionArray.from_storage(EncodedImageType(), pa.array([b1], pa.binary()))
    uris = ImageURIArray.from_uris(["a.ppm"])
    t = pa.table({"id": pa.array([1], pa.int64()), "img": enc, "uri": uris})
    ds = ls.write_dataset(t, str(tmp_path / "imgs"))
    row = ds.to_df(spark).first()
    assert bytes(row["img"]) == b1
    assert row["uri"] == "a.ppm"
