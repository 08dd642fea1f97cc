"""End-to-end quantization engine.

The TPU-native equivalent of the reference's driver flow
(HybridQuantization.quantization, HybridQuantization.java:93-137):

  1. build the S-CIELAB filter bank (host, init-time)
  2. S-CIELAB transform of the original image (device, once)
  3. SWASA search for the best palette (device `lax.scan`, chunked)
  4. final nearest-palette quantize pass
  5. optional Delta-E error image (HybridQuantization.java:139-182)

Everything per-iteration stays on device; the host only sees scalar
telemetry between scan chunks (progress/ETA/verbose parity with
ImageManipulation.java:533-567) and can cooperatively cancel via the
progress callback (the reference's stopFlag, HybridQuantization.java:312-318).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import colorspace as cs
from .config import QuantizationConfig
from .ops import assign as assign_ops
from .scielab import transform as sct
from .scielab.filters import ScielabFilters, build_filters
from .swasa import loop as swasa_loop
from .swasa import schedule
from .swasa.state import SWASAState

@jax.jit
def _dither_perturb_jit(image_hwc, palette, strength):
    """sRGB Bayer perturbation (single source: ops.assign.dither_perturbation)."""
    return assign_ops.dither_perturbation(image_hwc, palette, strength)


# ProgressFn(iteration, imax, telemetry) -> bool: return False to stop early.
ProgressFn = Callable[[int, int, dict], bool]


def _make_context(image_hwc: jnp.ndarray, filters: ScielabFilters, cfg: QuantizationConfig):
    """Device-resident per-image constants for the fitness function."""
    wp = jnp.asarray(cs.WHITEPOINTS[cfg.scielab.whitepoint])
    image_hwc = jnp.asarray(image_hwc, jnp.float32)
    pixels = image_hwc.reshape(-1, 3)
    if cfg.assignment_space == "lab":
        assign_pixels = cs.srgb_to_lab(pixels, wp)
    elif cfg.assignment_space == "srgb":
        assign_pixels = pixels
    else:
        raise ValueError(f"unknown assignment_space {cfg.assignment_space!r}")

    mats_h, mats_v = sct.band_matrices(filters)
    half = filters.half_width
    opp = cs.xyz_to_opp(cs.srgb_to_xyz(image_hwc))
    target_lab = cs.opp_to_lab(
        jnp.moveaxis(
            sct.scielab_filter_banded(
                jnp.moveaxis(opp, -1, 0), mats_h, mats_v, half
            ),
            0,
            -1,
        ),
        wp,
    )
    ctx = {
        "assign_pixels": assign_pixels,
        "target_lab": target_lab,
        "mats_h": mats_h,
        "mats_v": mats_v,
        "whitepoint": wp,
    }
    if _pallas_enabled(cfg):
        # Pre-packed planar pixel features for the Pallas kernel — packing
        # costs a full pixel-buffer rewrite, so do it once per image, not
        # once per fitness evaluation.
        from .ops import pallas_assign as pa
        from .ops.band_conv import padded_plan

        H, W = image_hwc.shape[:2]
        Hp, Wp, pad_ok = padded_plan(H, W, half)
        if pad_ok:
            # Mirror-pad the image ONCE to BLOCK multiples: the assign
            # kernel then emits an already-padded opponent image, and both
            # conv passes run with zero per-evaluation padding copies
            # (band_conv fast path). Padded pixels are mirror duplicates of
            # real pixels, so usage flags and the penalty are unaffected.
            image_padded = jnp.pad(
                image_hwc, ((0, Hp - H), (0, Wp - W), (0, 0)), mode="symmetric"
            )
            feats_padded = image_padded.reshape(-1, 3)
            if cfg.assignment_space == "lab":
                feats_padded = cs.srgb_to_lab(feats_padded, wp)
            ctx["x4"] = pa.pack_pixels(
                feats_padded, pa.pick_block(cfg.swasa.num_colors)
            )
            # Planar zero-padded target for the fused fitness kernel (the
            # pad region is masked out of the Delta-E sum in-kernel).
            ctx["target_planar"] = jnp.pad(
                jnp.moveaxis(target_lab, -1, 0),
                ((0, 0), (0, Hp - H), (0, Wp - W)),
            )
        else:
            ctx["x4"] = pa.pack_pixels(
                assign_pixels, pa.pick_block(cfg.swasa.num_colors)
            )
    return ctx


def make_fitness(
    ctx: dict, cfg: QuantizationConfig, half: int = 10
) -> swasa_loop.FitnessFn:
    """Palette -> (scalar fitness, usage) on one image context.

    Fuses the reference's per-evaluation device pipeline
    (quantizeAndConvertToOpp -> computeScielabKernelsTemp/End -> Opp2LAB ->
    CIEDE -> mean + penalty; ImageManipulation.java:620-727) into a single
    XLA-compiled function with an on-device mean. `half` is the filter
    half-width (static; filters.half_width).
    """
    H, W, _ = ctx["target_lab"].shape
    de_fn = cs.DELTA_E_FNS[cfg.deltaE]
    lab_assign = cfg.assignment_space == "lab"

    def fitness(palette: jax.Array):
        pal_feats = (
            cs.srgb_to_lab(palette, ctx["whitepoint"]) if lab_assign else palette
        )
        idx = assign_ops.nearest_palette(
            ctx["assign_pixels"], pal_feats, precision=cfg.precision
        )
        usage = assign_ops.palette_usage(idx, palette.shape[0])

        # Gather the *precomputed* opponent-space palette instead of
        # gamma-expanding the winning color per pixel
        # (OptimizedConvolution.cl:194-198 does the latter; K << P makes the
        # palette-side conversion free).
        # Planar (3, P) gather: an (P, 3) gather pads 3 lanes to 128 on TPU
        # (42.7x HBM expansion, OOM at 4K x pop); feature-on-sublane is cheap.
        opp_palette = cs.srgb_to_opp(palette)
        q_opp_chw = opp_palette.T[:, idx].reshape(3, H, W)
        q_lab = cs.opp_to_lab(
            jnp.moveaxis(
                sct.scielab_filter_banded(
                    q_opp_chw, ctx["mats_h"], ctx["mats_v"], half
                ),
                0,
                -1,
            ),
            ctx["whitepoint"],
        )
        err = jnp.mean(de_fn(ctx["target_lab"], q_lab))
        err = err + schedule.unused_penalty(usage, cfg.swasa.delta)
        return err, usage

    return fitness


def _pallas_enabled(cfg: QuantizationConfig) -> bool:
    from .ops import pallas_assign as pa

    # The Pallas kernel holds a (K_pad, block) score tile in VMEM; the
    # reference allows K up to 2^24 (HybridQuantization.java:192), so very
    # large palettes must route to the blocked XLA path (pick_block).
    feasible = pa.pick_block(cfg.swasa.num_colors) is not None
    if cfg.use_pallas == "on":
        if not feasible:
            raise ValueError(
                f"use_pallas='on' but K={cfg.swasa.num_colors} exceeds the "
                "assignment kernel's VMEM budget at any block size; use "
                "use_pallas='auto' (falls back to the XLA path)"
            )
        return True
    if cfg.use_pallas == "off":
        return False
    return jax.default_backend() == "tpu" and feasible


def make_population_fitness(ctx: dict, cfg: QuantizationConfig, half: int = 10):
    """(pop, K, 3) palettes -> ((pop,) errors, (pop, K) usage).

    On TPU this uses the fused Pallas assignment kernel with an explicit
    population grid (ops.pallas_assign) — the pixel stream is shared across
    members, the palette search is one MXU matmul per block — followed by the
    batched MXU banded-conv S-CIELAB. Elsewhere it is the vmapped jnp fitness.
    """
    if not _pallas_enabled(cfg):
        fn = jax.vmap(make_fitness(ctx, cfg, half))
        fn.is_population = True
        return fn

    from .ops import pallas_assign as pa
    from .ops import fused_fitness as ff
    from .ops.band_conv import BLOCK, conv_h_valid, conv_v_valid, padded_plan

    H, W, _ = ctx["target_lab"].shape
    Hp, Wp, pad_ok = padded_plan(H, W, half)
    de_fn = cs.DELTA_E_FNS[cfg.deltaE]
    lab_assign = cfg.assignment_space == "lab"
    interpret = jax.default_backend() != "tpu"
    SRC7 = (0, 1, 2, 0, 1, 2, 0)  # filter -> opponent-channel source
    use_fused = pad_ok and cfg.deltaE in ff.FUSED_DELTA_E
    conv_prec = cfg.conv_precision or cfg.precision
    blk = pa.pick_block(cfg.swasa.num_colors)  # matches _make_context packing

    def pop_fitness(palettes: jax.Array):
        pop = palettes.shape[0]
        pal_feats = (
            jax.vmap(lambda p: cs.srgb_to_lab(p, ctx["whitepoint"]))(palettes)
            if lab_assign
            else palettes
        )
        opp_palettes = jax.vmap(cs.srgb_to_opp)(palettes)
        opp, usage = pa.assign_opp_usage_pop(
            ctx["assign_pixels"],
            pal_feats,
            opp_palettes,
            x4=ctx["x4"],
            num_pixels=Hp * Wp if pad_ok else H * W,
            block=blk,
            interpret=interpret,
            precision=cfg.precision,
            tie_mode=cfg.tie_mode,
        )

        def penalties(use):
            return jax.vmap(
                lambda u: schedule.unused_penalty(u, cfg.swasa.delta)
            )(use)

        if use_fused:
            # Fast path: the assign kernel already emitted a mirror-padded
            # image; the fused Pallas kernel consumes it directly (edge
            # reflection is folded into the band matrices — zero per-eval
            # HBM copies). Both conv passes, the 7-channel intermediate
            # (VMEM-resident), Opp->LAB, Delta-E, and the masked
            # mean-reduction never leave the chip.
            q = opp.reshape(pop, 3, Hp, Wp)
            sums = ff.fused_scielab_err_sums(
                q,
                ctx["target_planar"],
                ctx["mats_h"],
                ctx["mats_v"],
                tuple(cs.WHITEPOINTS[cfg.scielab.whitepoint].tolist()),
                H=H, W=W,
                deltaE=cfg.deltaE,
                precision=conv_prec,
                interpret=interpret,
            )
            return sums / (H * W) + penalties(usage), usage

        if pad_ok:
            # XLA block-space conv path (now reachable only when a deltaE
            # kind is ever outside FUSED_DELTA_E — all three reference kinds
            # run fused since round 2): two pure-VALID
            # convs on the guard-padded image — no conv-internal padding, no
            # edge corrections (1.6x the padded-conv variant, measured).
            q = opp.reshape(pop, 3, Hp, Wp)
            q2 = jnp.pad(
                q, ((0, 0), (0, 0), (BLOCK, BLOCK), (BLOCK, BLOCK)),
                mode="symmetric",
            )
            t7 = conv_h_valid(q2, ctx["mats_h"], src=SRC7)
            y7 = conv_v_valid(t7, ctx["mats_v"])
            y3 = y7[:, :3] + y7[:, 3:6]
            y3 = y3.at[:, 0].add(y7[:, 6])
            filtered = y3[:, :, :H, :W]
        else:
            q_opp = opp.reshape(pop, 3, H, W)
            filtered = jax.vmap(
                lambda z: sct.scielab_filter_banded(
                    z, ctx["mats_h"], ctx["mats_v"], half
                )
            )(q_opp)

        def tail(filt, use):
            q_lab = cs.opp_to_lab(
                jnp.moveaxis(filt, 0, -1), ctx["whitepoint"]
            )
            err = jnp.mean(de_fn(ctx["target_lab"], q_lab))
            return err + schedule.unused_penalty(use, cfg.swasa.delta)

        errors = jax.vmap(tail)(filtered, usage)
        return errors, usage

    pop_fitness.is_population = True
    return pop_fitness


@functools.partial(jax.jit, static_argnames=("cfg", "half"))
def _init_jit(
    key, ctx, cfg: QuantizationConfig, half: int = 10, init_colors=None
) -> SWASAState:
    return swasa_loop.init_state(
        key, make_population_fitness(ctx, cfg, half), cfg.swasa, init_colors
    )


@functools.partial(jax.jit, static_argnames=("cfg", "num_iters", "half"))
def _chunk_jit(state, ctx, cfg: QuantizationConfig, num_iters: int, half: int = 10):
    return swasa_loop.run_chunk(
        state, make_population_fitness(ctx, cfg, half), cfg.swasa, num_iters
    )


class HybridQuantizer:
    """Drop-in engine mirroring the reference plugin's capabilities.

    Usage:
        q = HybridQuantizer(QuantizationConfig(...))
        palette, info = q.find_palette(image)          # (H, W, 3) sRGB float
        out = q.quantize(image, palette)
        mean_de, err_viz = q.error_image(image, out)
    """

    def __init__(self, config: QuantizationConfig | None = None):
        self.config = config or QuantizationConfig()
        self.filters = build_filters(
            self.config.scielab.dpi, self.config.scielab.viewing_distance_cm
        )
        self._whitepoint = cs.WHITEPOINTS[self.config.scielab.whitepoint]
        mats_h, mats_v = sct.band_matrices(self.filters)
        half = self.filters.half_width
        wp = jnp.asarray(self._whitepoint)

        # Band matrices as traced args (not closure constants): constants
        # feeding the HIGHEST banded einsum trigger multi-second XLA
        # constant-folding stalls on first compile (parallel.fast._prepare).
        def _scielab(img, mh, mv):
            opp = cs.xyz_to_opp(cs.srgb_to_xyz(img))
            filtered = sct.scielab_filter_banded(
                jnp.moveaxis(opp, -1, 0), mh, mv, half
            )
            return cs.opp_to_lab(jnp.moveaxis(filtered, 0, -1), wp)

        # One compiled function per image shape (jit caches on shape).
        _scielab_inner = jax.jit(_scielab)
        self._scielab_jit = lambda img: _scielab_inner(img, mats_h, mats_v)
        de_fn = cs.DELTA_E_FNS[self.config.deltaE]

        def _error_image(orig, quant, mh, mv):
            e = de_fn(
                _scielab(orig, mh, mv), _scielab(quant, mh, mv)
            )
            viz = ((255.0 - e) ** 2) / (255.0**2)
            return jnp.mean(e), jnp.repeat(viz[..., None], 3, axis=-1)

        _error_inner = jax.jit(_error_image)
        self._error_image_jit = lambda o, q: _error_inner(o, q, mats_h, mats_v)
        self._quantize_jit = jax.jit(self._quantize_impl)

    # -- S-CIELAB -----------------------------------------------------------

    def scielab(self, image_hwc) -> jax.Array:
        """sRGB (H, W, 3) -> S-CIELAB (H, W, 3)."""
        return self._scielab_jit(jnp.asarray(image_hwc, jnp.float32))

    # -- Optimization -------------------------------------------------------

    def find_palette(
        self,
        image_hwc,
        key: jax.Array | None = None,
        progress: Optional[ProgressFn] = None,
        chunk_size: int | None = None,
        initial_state: SWASAState | None = None,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 500,
    ):
        """SWASA search for the best K-color palette.

        Returns (palette (K, 3) float32 sRGB, info dict with the fitness
        trajectory and final state). Pass `initial_state` (e.g. from
        checkpoint.load_state) to resume a run; `checkpoint_path` writes the
        state atomically every `checkpoint_every` iterations — the reference
        had no checkpointing (SURVEY.md section 5).
        """
        cfg = self.config
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        chunk = chunk_size or cfg.progress_every
        half = self.filters.half_width
        ctx = _make_context(image_hwc, self.filters, cfg)
        if initial_state is not None:
            state = initial_state
        else:
            init_colors = None
            if cfg.init == "kmeans":
                from .ops.kmeans import kmeans_init_palettes

                key, sub = jax.random.split(key)
                init_colors = kmeans_init_palettes(
                    sub,
                    jnp.asarray(image_hwc, jnp.float32).reshape(-1, 3),
                    cfg.swasa.num_colors,
                    cfg.swasa.population,
                )
            elif cfg.init != "random":
                raise ValueError(f"unknown init {cfg.init!r}")
            state = _init_jit(key, ctx, cfg, half, init_colors)

        imax = cfg.swasa.imax
        traj = []
        start = time.time()
        done = int(jax.device_get(state.iteration))
        resumed_at = done
        last_ckpt = done
        while done < imax:
            n = min(chunk, imax - done)
            state, telemetry = _chunk_jit(state, ctx, cfg, n, half)
            done += n
            if checkpoint_path and done - last_ckpt >= checkpoint_every:
                from .checkpoint import save_state

                save_state(checkpoint_path, state)
                last_ckpt = done
            traj.append(jax.device_get(telemetry))
            if cfg.verbose:
                # Population stats parity (ImageManipulation.java:552-565).
                t = traj[-1]
                print(
                    f"iter {done}/{imax}  best {float(t['best_error'][-1]):.5f}"
                    f"  Population:  Mean : {float(t['mean_error'][-1]):.4f}"
                    f"  Best : {float(t['min_error'][-1]):.4f}"
                    f"  Std. Dev. : {float(t['std_error'][-1]):.4f}"
                )
            if progress is not None:
                elapsed = time.time() - start
                eta = elapsed / max(done - resumed_at, 1) * (imax - done)
                last = {k: float(v[-1]) for k, v in traj[-1].items()}
                last["eta_s"] = eta
                if progress(done, imax, last) is False:
                    break  # cooperative stop (reference stopFlag semantics)

        telemetry = {
            k: np.concatenate([t[k] for t in traj]) for k in traj[0]
        } if traj else {}
        info = {
            "best_error": float(jax.device_get(state.best_error)),
            "iterations": done,
            "telemetry": telemetry,
            "state": state,
            "seconds": time.time() - start,
        }
        if cfg.verbose:
            print(f"Final error : {info['best_error']:.5f}")
        return jax.device_get(state.best_colors), info

    # -- Palette refinement ---------------------------------------------------

    def polish(self, image_hwc, palette, iters: int = 10):
        """Lloyd (k-means) refinement of a palette in the assignment space.

        Beyond-reference feature (the reference's anneal is its only
        optimizer): each step moves every palette entry to the centroid of
        its assigned pixels — monotone in assignment-space MSE. In "lab"
        mode centroids are computed in CIELAB and mapped back to sRGB with
        gamut clamping. Note the SWASA fitness is the *spatial* S-CIELAB
        Delta-E, a different objective: polishing usually also lowers the
        mean Delta-E, but compare with error_image when it matters.
        """
        image = jnp.asarray(image_hwc, jnp.float32)
        palette = jnp.asarray(palette, jnp.float32)
        return assign_ops.polish_palette(
            image.reshape(-1, 3),
            palette,
            self.config.assignment_space,
            self._whitepoint,
            iters,
            # single-image entry: safe for the Pallas index kernel (not
            # under a vmapped sharded jit — lloyd_step doc)
            use_pallas=jax.default_backend() == "tpu",
        )

    # -- Quantize / error image --------------------------------------------

    def _quantize_impl(self, image, palette):
        if self.config.assignment_space == "lab":
            feats = cs.srgb_to_lab(image, self._whitepoint)
            pal_feats = cs.srgb_to_lab(palette, self._whitepoint)
            idx = assign_ops.nearest_palette(feats.reshape(-1, 3), pal_feats)
            return palette[idx].reshape(image.shape)
        return assign_ops.quantize_image(image, palette)

    def quantize(self, image_hwc, palette, dither: float = 0.0) -> jax.Array:
        """Apply a palette (nearest in the configured assignment space).

        dither > 0 perturbs the pixels with a tiled mean-zero Bayer
        threshold matrix scaled by the sRGB palette spacing BEFORE the
        nearest lookup (beyond-reference; reduces banding in smooth
        gradients at small K). The perturbation is in sRGB; the assignment
        itself still uses the configured assignment space. Strength is a
        traced scalar, so varying it never recompiles.
        """
        image = jnp.asarray(image_hwc, jnp.float32)
        pal = jnp.asarray(palette, jnp.float32)
        if dither > 0.0:
            image = _dither_perturb_jit(image, pal, jnp.float32(dither))
        return self._quantize_jit(image, pal)

    def error_image(self, original_hwc, quantized_hwc):
        """Mean S-CIELAB Delta-E + visualization image.

        Mirrors HybridQuantization.errorImage (HybridQuantization.java:139-182)
        and ImageManipulation.computeError (:858-894), including the
        ((255 - e)^2) / 255^2 visualization mapping (:890).
        """
        return self._error_image_jit(
            jnp.asarray(original_hwc, jnp.float32),
            jnp.asarray(quantized_hwc, jnp.float32),
        )

    # -- Full flow ----------------------------------------------------------

    def run(self, image_hwc, key=None, progress: Optional[ProgressFn] = None):
        """Full reference flow: palette search + quantize (+ metadata)."""
        palette, info = self.find_palette(image_hwc, key, progress)
        out = self.quantize(image_hwc, palette)
        info["palette"] = palette
        return jax.device_get(out), info
