"""Conv formulation shootout; chain trick cancels dispatch overhead."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from hybridquantization_tpu import QuantizationConfig, colorspace as cs
from hybridquantization_tpu.pipeline import HybridQuantizer, _make_context
from hybridquantization_tpu.ops.band_conv import conv_h_banded, BLOCK, _mirror_extend, _shifted

rng = np.random.default_rng(0)
H, W, POP = 2160, 3840, 4
cfg = QuantizationConfig()
eng = HybridQuantizer(cfg)
half = eng.filters.half_width
image = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
ctx = _make_context(image, eng.filters, cfg)
mh = ctx["mats_h"]
jax.device_get(mh[0][0,0,0])

xs = [rng.random((POP, 7, H, W)).astype(np.float32) for _ in range(3)]

def timed_pair(f1, f2, mk, scal, n=3):
    """Return marginal cost of one extra application: median(t2) - median(t1)."""
    def run(f):
        out = f(mk(0)); jax.device_get(scal(out))
        ts=[]
        for i in range(1, n+1):
            x = mk(i); jax.block_until_ready(x)
            t0=time.perf_counter(); out=f(x); jax.device_get(scal(out)); ts.append(time.perf_counter()-t0)
        ts.sort(); return ts[len(ts)//2]
    t1, t2 = run(f1), run(f2)
    return t1, t2, t2 - t1

def variant(name, conv_fn):
    f1 = jax.jit(lambda x: jax.vmap(conv_fn)(x))
    f2 = jax.jit(lambda x: jax.vmap(conv_fn)(jax.vmap(conv_fn)(x) * 0.5))
    t1, t2, marg = timed_pair(f1, f2, lambda i: jnp.asarray(xs[i%3]), lambda o: o[0,0,0,:2])
    print(f"{name}: single-call {t1*1e3:.1f} ms, marginal {marg*1e3:.1f} ms")

# A. current: einsum HIGHEST
variant("einsum HIGHEST", lambda z: conv_h_banded(z, mh, half))

# B. einsum DEFAULT precision
def conv_h_default(x):
    A, B_, Cm, E = mh
    C, Hh, Ww = x.shape
    xp = _mirror_extend(x, half, axis=2)
    nb = xp.shape[2] // BLOCK
    xb = xp.reshape(C, Hh, nb, BLOCK)
    mm = lambda xs_, M: jnp.einsum("chjb,cbk->chjk", xs_, M)
    y = mm(xb, B_) + mm(_shifted(xb, -1, 2), A) + mm(_shifted(xb, +1, 2), Cm)
    y0 = y[:, :, 0, :] + jnp.einsum("chb,cbk->chk", xb[:, :, 0, :], E)
    y = jnp.concatenate([y0[:, :, None, :], y[:, :, 1:, :]], axis=2)
    return y.reshape(C, Hh, nb * BLOCK)[:, :, :Ww]
variant("einsum DEFAULT", conv_h_default)

# C. single merged matmul (concat 3 shifts, one einsum, HIGHEST)
A_, B_, Cm_, E_ = mh
M3 = jnp.concatenate([A_, B_, Cm_], axis=1)  # (7, 384, 128)
def conv_h_merged(x):
    C, Hh, Ww = x.shape
    xp = _mirror_extend(x, half, axis=2)
    nb = xp.shape[2] // BLOCK
    xb = xp.reshape(C, Hh, nb, BLOCK)
    xcat = jnp.concatenate(
        [_shifted(xb, -1, 2), xb, _shifted(xb, +1, 2)], axis=3)  # (C,H,nb,384)
    y = jnp.einsum("chjb,cbk->chjk", xcat, M3, precision=lax.Precision.HIGHEST)
    y0 = y[:, :, 0, :] + jnp.einsum("chb,cbk->chk", xb[:, :, 0, :], E_,
                                    precision=lax.Precision.HIGHEST)
    y = jnp.concatenate([y0[:, :, None, :], y[:, :, 1:, :]], axis=2)
    return y.reshape(C, Hh, nb * BLOCK)[:, :, :Ww]
variant("merged HIGHEST", conv_h_merged)

# D. shift-FMA f32 (VPU) for comparison at pop4 scale
k7 = jnp.asarray(np.concatenate([eng.filters.k1.T, eng.filters.k2.T, eng.filters.k3[None]], 0))
def conv_shift(x):
    hh = k7.shape[1]//2
    xp = jnp.pad(x, ((0,0),(0,0),(hh,hh)), mode="symmetric")
    out = jnp.zeros_like(x)
    for t in range(k7.shape[1]):
        out = out + k7[:, t][:, None, None] * lax.slice_in_dim(xp, t, t + x.shape[2], axis=2)
    return out
variant("shift-FMA f32", conv_shift)
