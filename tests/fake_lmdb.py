"""Minimal dict-backed stand-in for the ``lmdb`` module.

The real lmdb C library is not part of this environment, which would leave
both our gated LMDB feature-store leg (data/features.py:206-243) and the
reference's ``utils_data`` module (which imports lmdb at module scope)
unexecutable in tests.  This shim implements exactly the API surface those
paths touch — ``open`` -> Environment -> ``begin`` -> transaction
get/put/cursor — persisting the key/value map to the target path as a pickle
so that a readonly re-open observes a prior writer's data, like the real
library.

Install it with :func:`install` (idempotent; a real ``lmdb`` wins if present).
"""

from __future__ import annotations

import builtins
import os
import pickle
import sys


class Error(Exception):
    pass


class _Txn:
    def __init__(self, env: "Environment", write: bool):
        self._env = env
        self._write = write

    # -- context manager ----------------------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if self._write and exc_type is None:
            self.commit()
        return False

    # -- transaction API -----------------------------------------------------
    def get(self, key, default=None):
        return self._env._data.get(bytes(key), default)

    def put(self, key, value, overwrite=True):
        if not self._write:
            raise Error("write attempted in a read-only transaction")
        k = bytes(key)
        if not overwrite and k in self._env._data:
            return False
        self._env._data[k] = bytes(value)
        return True

    def delete(self, key):
        return self._env._data.pop(bytes(key), None) is not None

    def cursor(self):
        return iter(sorted(self._env._data.items()))

    def stat(self):
        return {"entries": len(self._env._data)}

    def commit(self):
        self._env._flush()

    def abort(self):
        pass


class Environment:
    def __init__(self, path: str, map_size: int = 10 << 20, readonly: bool = False,
                 create: bool = True, subdir: bool = False, **_kw):
        self._path = path
        self._readonly = readonly
        self._file = os.path.join(path, "data.pkl") if subdir else path
        if os.path.isdir(path) and not subdir:
            # Tolerate callers that pass a real-lmdb directory layout.
            self._file = os.path.join(path, "data.pkl")
        if os.path.exists(self._file):
            with builtins.open(self._file, "rb") as f:
                self._data: dict[bytes, bytes] = pickle.load(f)
        elif readonly or not create:
            raise Error(f"No such database: {path}")
        else:
            self._data = {}
            if subdir:
                os.makedirs(path, exist_ok=True)

    def begin(self, write: bool = False, buffers: bool = False):
        if write and self._readonly:
            raise Error("environment is read-only")
        return _Txn(self, write)

    def _flush(self):
        if self._readonly:
            return
        parent = os.path.dirname(self._file)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with builtins.open(self._file, "wb") as f:
            pickle.dump(self._data, f, protocol=-1)

    def sync(self, force: bool = False):
        self._flush()

    def close(self):
        self._flush()

    def stat(self):
        return {"entries": len(self._data)}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def open(path, **kw):  # noqa: A001 - mirrors the lmdb module-level API
    return Environment(path, **kw)


def install() -> bool:
    """Register this shim as ``sys.modules['lmdb']`` unless the real one exists.

    Returns True if the shim (not real lmdb) is the active module."""
    try:
        import lmdb as _real  # noqa: F401

        return "fake_lmdb" in getattr(_real, "__name__", "")
    except ImportError:
        pass
    sys.modules["lmdb"] = sys.modules[__name__]
    return True
