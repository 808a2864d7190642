#!/usr/bin/env python
"""On-chip exactness probe for smem_fused._mxu_append.

The round-3 landing of the scatter-free megaq machine died on chip
with garbage compaction values: TPU MXU f32 matmuls default to a
single bf16 pass, truncating the 16-bit row halves to 8-bit mantissas
(CPU matmuls are exact, so the CPU suite stayed green).  This probe
runs the append on the REAL backend with adversarial values (all
>8-bit-mantissa patterns, int32 and int64) and verifies bit-exact
round-trips — it fails loudly on any backend whose matmul path is not
exact for the one-hot compaction.

Run solo (one chip grant per process): python scripts/exp_mxu_append_chip.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from tpubwa.device.smem_fused import _mxu_append
    import jax
    print(f"[probe] backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    bad = 0
    for dt, hi in ((np.int32, 2**31 - 1), (np.int64, 2**62)):
        for trial in range(4):
            ML, C, B, CAP = 8192, 6, 2048, 4096
            rows = rng.integers(0, hi, (ML, C)).astype(dt)
            # adversarial mantissas: odd values near powers of two
            rows[::3] = (rows[::3] | 1)
            rows[1::5] = (1 << np.arange(C)[None, :] * 4) + 8191
            store = rng.random(ML) < (0.02, 0.3, 0.9, 1.0)[trial]
            out = jnp.zeros((CAP + B, C), jnp.int64 if dt == np.int64
                            else jnp.int32)
            out_n = jnp.asarray(int(rng.integers(0, CAP // 2)),
                                jnp.int32)
            o2, n2, drop = jax.jit(_mxu_append, static_argnums=(4, 5))(
                out, out_n, jnp.asarray(rows), jnp.asarray(store), B,
                CAP)
            o2, n2, drop = (np.asarray(o2), int(n2), np.asarray(drop))
            erank = np.cumsum(store) - 1
            can = store & (erank < B) & (int(out_n) + erank < CAP)
            want = rows[can]
            got = o2[int(out_n):n2]
            if not (np.array_equal(got, want)
                    and n2 == int(out_n) + can.sum()
                    and np.array_equal(drop, store & ~can)):
                bad += 1
                print(f"[probe] MISMATCH dt={dt.__name__} "
                      f"trial={trial}: first bad row "
                      f"{np.argwhere(got != want)[:3]}",
                      file=sys.stderr)
    if bad:
        print(f"[probe] FAILED: {bad} mismatching trials",
              file=sys.stderr)
        sys.exit(1)
    print("[probe] _mxu_append bit-exact on this backend "
          "(8 trials, adversarial mantissas, i32+i64)")


if __name__ == "__main__":
    main()
