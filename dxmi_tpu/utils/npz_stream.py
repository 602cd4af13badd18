"""Streaming npz writer: append uint8 image batches into ``arr_0`` of an
.npz without ever materializing the full array.

50k 256^2 uint8 samples are ~9.8 GB — the reference avoids the same
hazard by telling users to use --skip_fid's PNG path for LSUN
(reference generate_large.py:91-93, README.md:172-176); here the
evaluator-npz path itself streams (the matching reader is
``evaluations.evaluator.iter_npz_batches``). The member is STORED
(uncompressed), which is also what ``np.savez`` does; zipfile computes
the CRC/sizes as the stream is written, so the row count must be known
up front (it always is: ``--n_sample``).
"""
from __future__ import annotations

import zipfile

import numpy as np


class NpzStreamWriter:
    """Incremental writer for a single-array npz with a known row count.

    >>> w = NpzStreamWriter(path, n_total=50000, shape_tail=(64, 64, 3))
    >>> w.write(batch)  # (B, 64, 64, 3) uint8, repeatedly
    >>> w.close()       # raises if the row count does not match
    """

    def __init__(self, path: str, n_total: int, shape_tail,
                 dtype=np.uint8, key: str = "arr_0"):
        self.path = path
        self.n_total = int(n_total)
        self.shape_tail = tuple(int(s) for s in shape_tail)
        self.dtype = np.dtype(dtype)
        self.n = 0
        self._zf = zipfile.ZipFile(path, "w", zipfile.ZIP_STORED)
        self._f = self._zf.open(key + ".npy", "w", force_zip64=True)
        shape = (self.n_total,) + self.shape_tail
        np.lib.format.write_array_header_1_0(
            self._f, {"descr": np.lib.format.dtype_to_descr(self.dtype),
                      "fortran_order": False, "shape": shape})

    def write(self, batch: np.ndarray) -> None:
        batch = np.ascontiguousarray(batch, dtype=self.dtype)
        assert batch.shape[1:] == self.shape_tail, batch.shape
        self._f.write(batch.tobytes())
        self.n += len(batch)

    def close(self) -> None:
        self._f.close()
        self._zf.close()
        if self.n != self.n_total:
            raise ValueError(
                f"NpzStreamWriter: wrote {self.n} rows, declared "
                f"{self.n_total} — the npz at {self.path} is inconsistent")
