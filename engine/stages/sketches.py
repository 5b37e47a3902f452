"""Mergeable sketches — the partial-aggregate pattern at its purest.

The reference has no approximate aggregates (nearest is the
information_schema *estimated* rowcount used to trigger TS-1 chunking,
src/checker/count_checker.py:105-112). At 10^12 rows an exact
COUNT(DISTINCT) is a full shuffle; a HyperLogLog sketch is one
map_batches pass emitting a 2^p-byte register array per batch and one
tiny driver-side merge — sketches are designed to be mergeable
(docs/SCALE.md shuffle-avoidance rules).

HyperLogLog (Flajolet et al.): p register-index bits, 64-bit hashes,
standard bias correction for the small-range regime. Deterministic
(fixed hash, no RNG); relative error ~1.04/sqrt(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textfeat import byte_view

_P_DEFAULT = 12


def _hash64_strings(arr) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string column (FNV-1a
    over bytes via the shingle machinery, finalized with a mix)."""
    data, offsets = byte_view(arr)
    # per-doc polynomial rolling hash over ALL bytes (cumulative trick)
    base = np.uint64(1099511628211)
    n = len(offsets) - 1
    out = np.full(n, np.uint64(14695981039346656037), dtype=np.uint64)
    # per-row python-free approach: iterate max-length times would be slow;
    # strings here are keys (short): do a bounded loop over byte positions
    lengths = offsets[1:] - offsets[:-1]
    maxlen = int(lengths.max()) if n else 0
    for j in range(maxlen):
        active = lengths > j
        idx = offsets[:-1][active] + j
        vals = data[idx].astype(np.uint64)
        out[active] = (out[active] ^ vals) * base
    # fmix64 finalizer
    out ^= out >> np.uint64(33)
    out *= np.uint64(0xFF51AFD7ED558CCD)
    out ^= out >> np.uint64(33)
    out *= np.uint64(0xC4CEB9FE1A85EC53)
    out ^= out >> np.uint64(33)
    return out


def _hash64_ints(arr) -> np.ndarray:
    v = np.asarray(arr, dtype=np.uint64)
    v ^= v >> np.uint64(33)
    v *= np.uint64(0xFF51AFD7ED558CCD)
    v ^= v >> np.uint64(33)
    v *= np.uint64(0xC4CEB9FE1A85EC53)
    v ^= v >> np.uint64(33)
    return v


def hll_partial(column, p: int = _P_DEFAULT) -> np.ndarray:
    """One batch -> (2^p,) uint8 register array."""
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    if pa.types.is_string(column.type) or pa.types.is_large_string(column.type):
        h = _hash64_strings(column)
    else:
        h = _hash64_ints(column.to_numpy(zero_copy_only=False))
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rho = leading zeros of `rest` + 1, vectorized via bit tricks
    rho = np.zeros(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    val = np.ones(len(h), dtype=np.uint8)
    alive = np.ones(len(h), dtype=bool)
    for _ in range(64 - p + 1):
        top = (cur & mask) != 0
        newly = alive & top
        rho[newly] = val[newly]
        alive &= ~top
        cur = cur << np.uint64(1)
        val += 1
        if not alive.any():
            break
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(registers: list[np.ndarray]) -> np.ndarray:
    out = registers[0].copy()
    for r in registers[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def approx_distinct(ds, column: str, p: int = _P_DEFAULT) -> float:
    """Dataset-level approximate COUNT(DISTINCT col): per-batch sketches,
    driver merge. One streaming pass, no shuffle."""
    def emit(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch[column], p)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(emit, batch_format="pyarrow").take_all()
    regs = hll_merge([np.frombuffer(r["sketch"], dtype=np.uint8) for r in parts])
    return hll_estimate(regs)
