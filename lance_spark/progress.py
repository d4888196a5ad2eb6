"""Fragment-write progress hooks — reference python/python/lance/progress.py.

Distributed writers (one Spark task per fragment) call ``begin`` before a
fragment's files exist and ``complete`` after — a job that dies mid-write
leaves a visible ``.in_progress`` marker for every unfinished fragment, so
recovery tooling can delete partial files instead of guessing. Progress
objects are shipped INTO tasks (pickled), so implementations must carry
only plain state; the filesystem variant holds just a directory path.
"""

from __future__ import annotations

import json
import os
from abc import ABC, abstractmethod


class FragmentWriteProgress(ABC):
    """Hook interface (reference progress.py:18-69). ``fragment`` is the
    metadata dict ``{"id": int, "path": str}`` known at write start."""

    @abstractmethod
    def begin(self, fragment: dict, **kwargs) -> None: ...

    @abstractmethod
    def complete(self, fragment: dict, **kwargs) -> None: ...


class NoopFragmentWriteProgress(FragmentWriteProgress):
    """Default no-op (reference progress.py:72-82)."""

    def begin(self, fragment: dict, **kwargs) -> None:
        pass

    def complete(self, fragment: dict, **kwargs) -> None:
        pass


class FileSystemFragmentWriteProgress(FragmentWriteProgress):
    """Marker-file tracker (reference progress.py:85-160): ``begin`` drops
    ``frag-<id>.in_progress`` + the fragment json under ``base_uri``;
    ``complete`` removes the marker. Surviving markers after a crashed job
    name exactly the fragments whose data files are partial garbage."""

    PROGRESS_EXT = ".in_progress"

    def __init__(self, base_uri: str, metadata: dict | None = None):
        self.base_path = str(base_uri)
        self.metadata = metadata or {}

    def _marker(self, fragment: dict) -> str:
        return os.path.join(self.base_path, f"frag-{fragment['id']}{self.PROGRESS_EXT}")

    def _fragment_file(self, fragment: dict) -> str:
        return os.path.join(self.base_path, f"frag-{fragment['id']}.json")

    def begin(self, fragment: dict, **kwargs) -> None:
        os.makedirs(self.base_path, exist_ok=True)
        with open(self._marker(fragment), "w") as fh:
            json.dump({"fragment_id": fragment["id"], "metadata": self.metadata}, fh)
        with open(self._fragment_file(fragment), "w") as fh:
            json.dump(fragment, fh)

    def complete(self, fragment: dict, **kwargs) -> None:
        try:
            os.remove(self._marker(fragment))
        except FileNotFoundError:
            pass

    def unfinished_fragments(self) -> list[int]:
        """Fragment ids whose markers survived (crashed writes)."""
        if not os.path.isdir(self.base_path):
            return []
        out = []
        for name in os.listdir(self.base_path):
            if name.endswith(self.PROGRESS_EXT):
                out.append(int(name[len("frag-"): -len(self.PROGRESS_EXT)]))
        return sorted(out)
