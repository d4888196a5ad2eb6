"""HuggingFace dataset interop — the reference ``lance.hf`` surface
(python/python/lance/hf.py): ``HuggingFaceConverter`` maps arrow columns
back to HF feature types for training loops. The write-side HF path (a
``datasets.Dataset`` as ``write_dataset`` input) lives in write.py's
``input_to_spark_df``.
"""

from __future__ import annotations

import io
from typing import Any


class HuggingFaceConverter:
    """pyarrow → HuggingFace-internal types, driven by the dataset's
    feature metadata (reference hf.py:14-43). PIL/torch are import-guarded:
    the conversion raises a clear ImportError only when an Image feature is
    actually decoded."""

    def __init__(self, ds_info: dict[str, Any]):
        self.ds_info = ds_info

    def _to_pil_image(self, scalar):
        import PIL.Image

        row = scalar.as_py()
        if row.get("bytes") is None:
            return PIL.Image.open(row["path"])
        return PIL.Image.open(io.BytesIO(row["bytes"]))

    def to_pytorch(self, col: str, array):
        """Convert one column for a torch loop: HF ``Image`` structs become
        PIL images; columns absent from the features dict return None (the
        caller falls back to its default tensor conversion)."""
        try:
            feature = self.ds_info["info"]["features"][col]
        except KeyError:
            return None
        if feature["_type"] == "Image":
            return [self._to_pil_image(x) for x in array]
        raise NotImplementedError(
            f"Conversion to {feature['_type']} is not implemented"
        )
