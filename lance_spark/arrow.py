"""Arrow extension types for image columns — reference
python/python/lance/arrow.py (ImageURIType / EncodedImageType /
FixedShapeImageTensorType and their array classes).

The reference decodes through tensorflow/PIL; this container has neither,
so decode/encode run through the repo's own dependency-free PPM/BMP codecs
(operators/multimodal.py) — uri → encoded bytes → fixed-shape tensor is a
fully working pipeline for those formats, and the extension-type plumbing
(serialization, storage types, Spark ingest unwrap in types.py) is format-
agnostic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class ImageURIType(pa.ExtensionType):
    """String storage of image locations (reference arrow.py:45)."""

    def __init__(self, storage_type: pa.DataType = pa.string()):
        if storage_type not in (pa.string(), pa.large_string()):
            raise ValueError("storage_type must be a string type")
        super().__init__(storage_type, "lance.arrow.image_uri")

    def __arrow_ext_serialize__(self) -> bytes:
        return b""

    @classmethod
    def __arrow_ext_deserialize__(cls, storage_type, serialized):
        return ImageURIType(storage_type)

    def __arrow_ext_class__(self):
        return ImageURIArray

    def __reduce__(self):
        return type(self).__arrow_ext_deserialize__, (self.storage_type, b"")


class EncodedImageType(pa.ExtensionType):
    """Binary storage of encoded image bytes (reference arrow.py:74)."""

    def __init__(self, storage_type: pa.DataType = pa.binary()):
        if storage_type not in (pa.binary(), pa.large_binary()):
            raise ValueError("storage_type must be a binary type")
        super().__init__(storage_type, "lance.arrow.encoded_image")

    def __arrow_ext_serialize__(self) -> bytes:
        return b""

    @classmethod
    def __arrow_ext_deserialize__(cls, storage_type, serialized):
        return EncodedImageType(storage_type)

    def __arrow_ext_class__(self):
        return EncodedImageArray

    def __reduce__(self):
        return type(self).__arrow_ext_deserialize__, (self.storage_type, b"")


class FixedShapeImageTensorType(pa.ExtensionType):
    """Decoded pixels as fixed-size-list storage (reference arrow.py:103)."""

    def __init__(self, arrow_type: pa.DataType, shape):
        self.shape = tuple(int(d) for d in shape)
        self.arrow_type = arrow_type
        assert len(self.shape) > 0
        length = 1
        for dim in self.shape:
            length *= dim
        super().__init__(
            pa.list_(arrow_type, length), "lance.arrow.fixed_shape_image_tensor"
        )

    def __arrow_ext_serialize__(self) -> bytes:
        import json

        return json.dumps({"shape": list(self.shape)}).encode()

    @classmethod
    def __arrow_ext_deserialize__(cls, storage_type, serialized):
        import json

        shape = json.loads(serialized.decode())["shape"]
        return FixedShapeImageTensorType(storage_type.value_type, shape)

    def __arrow_ext_class__(self):
        return FixedShapeImageTensorArray

    def __reduce__(self):
        return type(self).__arrow_ext_deserialize__, (
            self.storage_type,
            self.__arrow_ext_serialize__(),
        )


class ImageURIArray(pa.ExtensionArray):
    """Array of image URIs; ``read_uris`` materializes the bytes."""

    @classmethod
    def from_uris(cls, uris) -> "ImageURIArray":
        storage = pa.array(list(uris), pa.string())
        return pa.ExtensionArray.from_storage(ImageURIType(), storage)

    def read_uris(self) -> "EncodedImageArray":
        """Fetch each uri's bytes (local paths / file:// URIs) →
        EncodedImageArray (reference arrow.py ImageURIArray.read_uris)."""
        bufs = []
        for u in self.storage.to_pylist():
            if u is None:
                bufs.append(None)  # null uri → null bytes, not open(None)
                continue
            path = u
            if u.startswith("file://"):
                rest = u[len("file://"):]
                # file://localhost/a.ppm and file:///a.ppm both mean /a.ppm
                # (RFC 8089); keeping the host as a path prefix broke them
                if rest.startswith("localhost/"):
                    rest = rest[len("localhost"):]
                path = rest
            with open(path, "rb") as fh:
                bufs.append(fh.read())
        return pa.ExtensionArray.from_storage(EncodedImageType(), pa.array(bufs, pa.binary()))


class EncodedImageArray(pa.ExtensionArray):
    """Array of encoded image bytes; decodes through the PPM/BMP codecs."""

    def to_tensor(self) -> "FixedShapeImageTensorArray":
        """Decode every image (all must share one shape) →
        FixedShapeImageTensorArray of uint8 (reference image_to_tensor)."""
        from lance_spark.operators.multimodal import _parse_bmp, _parse_ppm

        mats, shape = [], None
        for b in self.storage.to_pylist():
            if b is None:
                raise ValueError(
                    "to_tensor: array contains a null image; filter nulls"
                    " first (a fixed-shape tensor array cannot hold holes)"
                )
            if b[:2] == b"P6":
                w, h, c, px = _parse_ppm(b)
            elif b[:2] == b"BM":
                w, h, c, px = _parse_bmp(b)
            else:
                raise ValueError(f"unsupported codec (magic {b[:2]!r}); P6 PPM/BMP supported")
            if px is None:
                raise ValueError("image payload truncated")
            cur = (h, w, c)
            if shape is None:
                shape = cur
            elif shape != cur:
                raise ValueError(f"mixed shapes: {shape} vs {cur}")
            mats.append(np.asarray(px, dtype=np.uint8).reshape(-1))
        assert shape is not None, "empty array"
        flat = pa.array(np.concatenate(mats) if mats else [], pa.uint8())
        n = int(np.prod(shape))
        storage = pa.FixedSizeListArray.from_arrays(flat, n)
        return pa.ExtensionArray.from_storage(
            FixedShapeImageTensorType(pa.uint8(), shape), storage
        )


class FixedShapeImageTensorArray(pa.ExtensionArray):
    """Decoded pixel tensors with a fixed shape."""

    def to_numpy(self, zero_copy_only: bool = False) -> np.ndarray:
        shape = self.type.shape
        if self.storage.null_count:
            # FixedSizeListArray.flatten() DROPS values under null slots, so
            # the dense reshape would mis-align every row after the first
            # null (r12 review) — fail loudly instead
            raise ValueError(
                "to_numpy: tensor array contains nulls; drop or fill them first"
            )
        flat = self.storage.flatten().to_numpy(zero_copy_only=zero_copy_only)
        return flat.reshape((len(self), *shape))

    def to_encoded(self) -> "EncodedImageArray":
        """Re-encode tensors as PPM (P6/P5) bytes — the dependency-free
        counterpart of the reference's PIL encode path."""
        arr = self.to_numpy()
        if arr.ndim != 4 or arr.shape[3] != 3:
            raise ValueError(f"PPM encode needs (h, w, 3) tensors, got shape {arr.shape[1:]}")
        bufs = []
        for img in arr:
            h, w = img.shape[0], img.shape[1]
            header = b"P6 " + f"{w} {h} 255\n".encode()
            bufs.append(header + img.astype(np.uint8).tobytes())
        return pa.ExtensionArray.from_storage(EncodedImageType(), pa.array(bufs, pa.binary()))


def _register() -> None:
    for t in (ImageURIType(), EncodedImageType(), FixedShapeImageTensorType(pa.uint8(), (1,))):
        try:
            pa.register_extension_type(t)
        except pa.ArrowKeyError:
            pass  # already registered (module re-import)


_register()
