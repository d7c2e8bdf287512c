"""Round-5 GI device-step decomposition at the large-config shape
(B=4096, n=33, m=897, slots=12, PURE f32 slot space): how much of a GI
iteration is the violation scan (XLA-optimal per round-4) vs the
slot-space bookkeeping (the Pallas-fusable candidate)."""
import time
import numpy as np
import jax
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp
from mpc_tpu.utils.config import jit32
from mpc_tpu.ops.qp_active import solve_qp_active, build_gi_cache

B, n, m, cap = 4096, 33, 897, 12
rng = np.random.default_rng(0)
M = rng.normal(size=(n, n))
P = (M @ M.T + n * np.eye(n)).astype(np.float32)
A = rng.normal(size=(m, n)).astype(np.float32)
q = rng.normal(size=(B, n)).astype(np.float32)
# anchor bounds at each lane's UNCONSTRAINED minimum so the violated rows
# are exactly the intended ~4 active ones (bounds around a random point
# left >cap rows violated -> every lane overflowed the slot buffer)
x_t = -np.linalg.solve(P.astype(np.float64), q.T.astype(np.float64)).T
x_t = x_t.astype(np.float32)
Ax = x_t @ A.T
off = rng.uniform(0.5, 5.0, size=(B, m)).astype(np.float32)
act = rng.random((B, m)) < (4.0 / m)          # ~4 active rows per lane
l = np.where(act, Ax + 0.2, Ax - off).astype(np.float32)
u_b = (l + 50.0).astype(np.float32)
cache = build_gi_cache(jnp.asarray(P), jnp.asarray(A))

solve = jit32(jax.vmap(lambda qq, ll, uu: solve_qp_active(
    jnp.asarray(P), qq, jnp.asarray(A), ll, uu, cache=cache,
    max_active=cap)))

def timed(f, *a, reps=10):
    out = f(*a)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / reps, out

dt_full, sol = timed(solve, jnp.asarray(q), jnp.asarray(l), jnp.asarray(u_b))
iters = float(np.asarray(sol.iters).mean())
it_max = float(np.asarray(sol.iters).max())
conv = int(np.asarray(sol.converged).sum())
print(f"full GI solve: {dt_full*1e3:.2f} ms, iters mean {iters:.1f} "
      f"max {it_max:.0f}, conv {conv}/{B}")

# scan-only proxy: T iterations of the violation scan (A@x + row select)
T = int(round(it_max))
Ad = jnp.asarray(A)
@jit32
def scan_only(x0):
    def body(c, _):
        x, s = c
        v = jnp.einsum("bn,mn->bm", x, Ad)
        viol = jnp.maximum(jnp.asarray(l) - v, v - jnp.asarray(u_b))
        j = jnp.argmax(viol, axis=1)
        x = x + 1e-6 * Ad[j]                 # row gather prevents CSE
        return (x, s + j.sum()), None
    (xf, s), _ = jax.lax.scan(body, (x0, jnp.int32(0)), None, length=T)
    return xf[0, 0] + s.astype(jnp.float32)
dt_scan, _ = timed(scan_only, jnp.asarray(x_t))
print(f"scan-only x{T}: {dt_scan*1e3:.2f} ms "
      f"({dt_scan/dt_full*100:.0f}% of full)")
print(f"slot-op + loop-overhead share: {(1-dt_scan/dt_full)*100:.0f}% "
      f"=> Pallas ceiling if slot ops were FREE: "
      f"{dt_full/dt_scan:.2f}x on the GI solve")
