"""TPU hardware self-test: kernel parity + amortized timings.

Runs the Pallas kernels (ball query, FPS, 3-NN) against their XLA
references ON THE ATTACHED TPU and prints amortized per-call timings
(the tunneled backend's block_until_ready is async — timings here repeat
each op inside one jit and difference out the dispatch floor; CLAUDE.md).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_selftest.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def amortized_ms(fn, args, n=6):
    import jax
    import jax.numpy as jnp

    def rep(m):
        def f(*a):
            def body(i, acc):
                out = fn(*(x + acc * 1e-12
                           if jnp.issubdtype(x.dtype, jnp.floating) else x
                           for x in a))
                leaf = jax.tree.leaves(out)[0]
                return acc + jnp.sum(
                    leaf[(0,) * leaf.ndim].astype(jnp.float32)) * 1e-12
            return jax.lax.fori_loop(0, m, body, jnp.float32(0))
        return jax.jit(f)

    f1, fn_ = rep(1), rep(n)
    np.asarray(f1(*args))
    np.asarray(fn_(*args))
    t0 = time.time()
    np.asarray(f1(*args))
    t1 = time.time() - t0
    t0 = time.time()
    np.asarray(fn_(*args))
    tn = time.time() - t0
    return (tn - t1) / (n - 1) * 1000


def main():
    import jax
    import jax.numpy as jnp
    from ws3d_tpu.ops.ball_query_pallas import ball_query_pallas
    from ws3d_tpu.ops.three_nn_pallas import three_nn_pallas
    from ws3d_tpu.ops.grouping import _ball_query_chunk_multi
    from ws3d_tpu.ops.interpolate import _three_nn_chunk
    from ws3d_tpu.ops.sampling import _fps_scan, _fps_pallas

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)
    failures = 0

    # --- ball query (SA-1 scale) ---
    xyz = jnp.asarray(rng.randn(4, 16384, 3).astype(np.float32) * 10)
    q = jnp.asarray(rng.randn(4, 4096, 3).astype(np.float32) * 10)
    radii, ks = [0.1, 0.5], [16, 32]
    a = [np.asarray(x) for x in jax.jit(
        lambda p, c: ball_query_pallas(radii, ks, p, c))(xyz, q)]
    b = [np.asarray(x) for x in jax.jit(
        lambda p, c: _ball_query_chunk_multi(c, p, tuple(radii),
                                             tuple(ks)))(xyz, q)]
    ok = all((x == y).all() for x, y in zip(a, b))
    print(f"ball_query parity: {'OK' if ok else 'FAIL'}")
    failures += not ok
    print("  pallas  %.1f ms" % amortized_ms(
        lambda p, c: ball_query_pallas(radii, ks, p, c), (xyz, q)))

    # --- FPS ---
    fa = np.asarray(jax.jit(lambda p: _fps_scan(p, 4096))(xyz))
    fb, fc = jax.jit(lambda p: _fps_pallas(p, 4096))(xyz)
    fb = np.asarray(fb)
    ok = (fa == fb).all()
    from ws3d_tpu.ops.sampling import gather_points
    ok &= np.allclose(np.asarray(fc),
                      np.asarray(gather_points(xyz, jnp.asarray(fb))))
    print(f"fps parity (idx + coords): {'OK' if ok else 'FAIL'}")
    failures += not ok
    print("  pallas  %.1f ms" % amortized_ms(
        lambda p: _fps_pallas(p, 4096), (xyz,)))

    # --- 3-NN ---
    unk = jnp.asarray(rng.randn(4, 16384, 3).astype(np.float32) * 10)
    kno = jnp.asarray(rng.randn(4, 4096, 3).astype(np.float32) * 10)
    da, ia = jax.jit(_three_nn_chunk)(unk, kno)
    db_, ib = jax.jit(three_nn_pallas)(unk, kno)
    ok = (np.asarray(ia) == np.asarray(ib)).all()
    print(f"three_nn parity: {'OK' if ok else 'FAIL'}")
    failures += not ok
    print("  pallas  %.1f ms" % amortized_ms(three_nn_pallas, (unk, kno)))

    print("SELFTEST", "FAILED" if failures else "PASSED")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
