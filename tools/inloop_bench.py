"""In-device-loop timing of fitness / assign / fused at 4K/K256/pop4.

Amortizes the ~30 ms relay dispatch by running 12-24 reps inside one jitted
fori_loop with rotating palette/q inputs (CLAUDE.md timing rules).
Run: python tools/inloop_bench.py [fitness|assign|fused ...]
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from hybridquantization_tpu import QuantizationConfig, SWASAConfig
from hybridquantization_tpu.pipeline import HybridQuantizer, _make_context, make_population_fitness
from hybridquantization_tpu.ops import fused_fitness as ff
from hybridquantization_tpu.ops import pallas_assign as pa
from hybridquantization_tpu.ops.band_conv import padded_plan
from hybridquantization_tpu import colorspace as cs

H, W, POP = 2160, 3840, 4
# K overridable for the pruning-ceiling probe (docs/PERFORMANCE.md round-4:
# a candidate-pruned kernel with K' candidates per block can never beat the
# dense kernel timed at K=K' — same dots, same chain, minus all pruning
# overhead — so t(K') is the hard ceiling of any pruning design)
K = int(os.environ.get("KK", "256"))
PREC = os.environ.get("PREC", "f32x3")

def main():
    which = sys.argv[1:] or ["fitness", "assign", "fused"]
    rng = np.random.default_rng(0)
    cfg = QuantizationConfig(swasa=SWASAConfig(num_colors=K, population=POP))
    engine = HybridQuantizer(cfg)
    half = engine.filters.half_width
    Hp, Wp, _ = padded_plan(H, W, half)
    image = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    ctx = _make_context(image, engine.filters, cfg)
    jax.device_get(ctx["target_lab"][0, 0])
    pals = jnp.asarray(rng.random((8, POP, K, 3)).astype(np.float32))
    wp_tuple = tuple(cs.WHITEPOINTS["D65"].tolist())

    def run(name, fn, *args, reps=1):
        out = fn(*args); jax.device_get(out)
        t0 = time.perf_counter(); out = fn(*args); jax.device_get(out)
        print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:7.2f} ms", flush=True)

    if "fitness" in which:
        fit = make_population_fitness(ctx, cfg, half)

        @jax.jit
        def loop_fit(ctx, pals):
            def body(it, acc):
                e, u = fit(pals[it % 8])
                return acc + e[0] + jnp.float32(jnp.sum(u[0]))
            return jax.lax.fori_loop(0, 24, body, jnp.float32(0.))
        # NB: fit closes over ctx arrays -> they are jit-constants here;
        # acceptable for a one-off timing probe (compile is slower, runtime
        # identical); the production entry points take ctx as an argument.
        run("fitness", loop_fit, ctx, pals, reps=24)

    if "assign" in which:
        @jax.jit
        def loop_assign(x4, pals):
            def body(it, acc):
                p = pals[it % 8]
                opp, usage = pa.assign_opp_usage_pop(None, p, p, x4=x4, num_pixels=Hp * Wp)
                return acc + opp[0, 0, 0] + jnp.float32(usage[0, 0])
            return jax.lax.fori_loop(0, 24, body, jnp.float32(0.))
        run("assign", loop_assign, ctx["x4"], pals, reps=24)

    if "fused" in which:
        q8 = jnp.asarray(rng.standard_normal((2, POP, 3, Hp, Wp)).astype(np.float32) * 0.1)

        @jax.jit
        def loop_fused(q8, tgt, mh, mv):
            def body(it, acc):
                s = ff.fused_scielab_err_sums(q8[it % 2], tgt, mh, mv, wp_tuple,
                                              H=H, W=W, deltaE="CIE76", precision=PREC)
                return acc + s[0]
            return jax.lax.fori_loop(0, 12, body, jnp.float32(0.))
        run("fused", loop_fused, q8, ctx["target_planar"], ctx["mats_h"], ctx["mats_v"], reps=12)

if __name__ == "__main__":
    main()
