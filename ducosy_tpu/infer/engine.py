"""Batched dual-model inference engine.

The reference inference loop runs one slice at a time through two generators
sequentially (generate.py:89-102, batch=1). The TPU-native engine instead:

  - stacks the soft-tissue and lung generator parameter trees on a leading
    axis and runs BOTH models as one vmapped forward — a single XLA program
    with twice the batch-parallel work, keeping the MXU fed;
  - batches `slice_batch` slices per call with static shapes (one compile);
  - performs the whole slice pipeline on device under one jit: stored pixels
    -> HU -> both HU windows (modules/preprocess.py:68-90) -> resize to
    img_size -> generators -> resize back -> stored-pixel outputs
    (modules/preprocess.py:93-112), so each slice crosses host<->device
    exactly once in each direction;
  - bf16 compute by default (fp32 available for strict parity).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ducosy_tpu.config import LUNG, SOFT_TISSUE, ModelConfig, RangeConfig
from ducosy_tpu.models import Generator
from ducosy_tpu.models.torch_import import (
    generator_params_from_torch,
    load_torch_state_dict,
)
from ducosy_tpu.ops import hu
from ducosy_tpu.ops.resize import resize_hw


def _stack_params(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree_util.tree_map(
        lambda x, y: jnp.stack([jnp.asarray(x), jnp.asarray(y)]), a, b)


class DualGeneratorEngine:
    """Soft-tissue + lung generators fused into one vmapped forward."""

    def __init__(self, st_params: Dict[str, Any], lung_params: Dict[str, Any],
                 *, st_range: RangeConfig = SOFT_TISSUE,
                 lung_range: RangeConfig = LUNG,
                 model_cfg: ModelConfig = ModelConfig(),
                 img_size: int = 512, compute_dtype=jnp.bfloat16,
                 fused_norm: bool = False, mesh=None,
                 forward: str = "auto", trunk_int8: bool = False,
                 quant: str | None = None, trunk: str = "auto",
                 soft_squeeze: bool = False):
        # fused_norm routes InstanceNorm through the Pallas kernel. Round-1
        # measurements had it +17% on this pipeline; the libtpu/XLA upgrade
        # since then improved XLA's own IN fusion and flipped the A/B
        # (75 vs 63.5 slices/s compute-bound at chunk 32) — so plain XLA is
        # now the default and the kernel stays available for toolchains
        # where it wins. Always re-A/B after a toolchain change.
        # optional device mesh: a 1-D ("data",) mesh shards each chunk's
        # slice batch across devices inside the fused patient program; a 2-D
        # ("data", "sp") mesh (parallel.data_sp_mesh) additionally shards
        # image rows over 'sp' — XLA SPMD inserts the conv halo exchanges —
        # for latency-critical serving where slices < chips
        self.mesh = mesh
        self._sp = 1
        if mesh is not None:
            from ducosy_tpu.parallel.mesh import SP_AXIS
            self._sp = int(mesh.shape.get(SP_AXIS, 1))
        if self._sp > 1:
            if quant or trunk_int8 or fused_norm:
                raise ValueError(
                    "spatial ('sp') sharding partitions the H axis, which "
                    "the Pallas kernels and the quantized modes don't "
                    "support — serve those single-chip or over a pure "
                    "'data' mesh")
            if trunk not in ("auto", "xla"):
                raise ValueError(
                    f"trunk={trunk!r} is a Pallas kernel path; under sp "
                    "sharding only trunk='xla' partitions (XLA SPMD "
                    "inserts the halo exchanges)")
            # The packed forward with the XLA trunk is pure XLA ops, so
            # SPMD partitions it like the module path — the partitioned
            # HLO carries the SAME collective profile (65 vs 70 halo
            # permutes, 32 all-to-alls from the s2d/d2s reshapes present
            # in both, ~29 IN-stats all-reduces; measured on a (2,2)
            # virtual mesh, sp output exact vs single-device) — while
            # keeping packed's single-chip advantage (module 59.4 ms vs
            # packed/xla 44 ms at batch 8 x 512^2, docs/PERF.md). So sp
            # serving defaults to packed instead of eating a ~40% cliff.
            if forward == "auto":
                forward = "packed" if img_size % 4 == 0 else "module"
            if forward == "packed":
                trunk = "xla"
        self.st_range = st_range
        self.lung_range = lung_range
        self.img_size = img_size
        # soft_squeeze: normalize INPUTS with the training dataset's
        # nonlinear squeeze (hu.soft_squeeze, per-range use_soft_squeezing)
        # instead of the linear window. Default False = exact parity with
        # the reference's serving path (generate.py preprocess_dicom is
        # linear even for squeeze-trained checkpoints). Output decode is
        # linear EITHER WAY — also reference semantics (postprocess_tensor
        # is linear), and the only sane choice: at the default sigma=50
        # the squeeze maps the whole top window decile into a ~5e-4-wide
        # band, so an output-side inverse would amplify model noise ~200x.
        self.soft_squeeze = soft_squeeze

        # Channel counts come from the checkpoints themselves (stem kernel is
        # (7, 7, in_ch, base)). The reference's released A2B checkpoints are
        # 1-channel (generate.py:29-30); models trained by THIS framework
        # default to image + anatomical-mask conditioning channels
        # (argmanager.py:121-152), which the engine regenerates from the raw
        # HU at inference time.
        st_ch = int(np.shape(st_params["stem"]["kernel"])[2])
        lung_ch = int(np.shape(lung_params["stem"]["kernel"])[2])
        self.st_channels, self.lung_channels = st_ch, lung_ch
        self.use_masks = st_ch > 1 or lung_ch > 1

        def n_blocks(params):
            # introspect the trunk depth from the checkpoint itself (the
            # reference's loaders do the same for its aux model,
            # modules/nmodel/inference.py:17-62)
            blocks = [int(k[5:]) for k in params if k.startswith("block")]
            return max(blocks) + 1 if blocks else 0

        def build(in_ch, params):
            return Generator(
                input_channels=in_ch,
                num_residual_blocks=n_blocks(params),
                base_channels=int(
                    np.shape(params["stem"]["kernel"])[3]),
                use_cbam="ca" in params.get("block0", {}),
                dtype=compute_dtype,
                fused_norm=fused_norm,
            )

        if not self.use_masks:
            # fused path: identical trees -> stack + vmap, one XLA program
            self.generator = build(1, st_params)
            self.params = _stack_params(st_params, lung_params)
        else:
            self.st_generator = build(st_ch, st_params)
            self.lung_generator = build(lung_ch, lung_params)
            self.params = {
                "st": jax.tree_util.tree_map(jnp.asarray, st_params),
                "lung": jax.tree_util.tree_map(jnp.asarray, lung_params),
            }
        # "packed": the space-to-depth generator forward (models/fused.py,
        # exact to bf16 rounding) — +49% single-model throughput at 512^2
        # (59.4 -> 39.9 ms for batch 8; docs/PERF.md round 2). "auto" uses
        # it on a real TPU whenever the model grid divides by 4 (on CPU the
        # canonical Flax apply is faster); "module"/"packed" force a path.
        if forward == "auto":
            from ducosy_tpu.ops.pallas import pallas_available
            forward = "packed" if (img_size % 4 == 0 and
                                   pallas_available()) else "module"
        self.forward_impl = forward
        # trunk_int8 (packed forward only): quantized serving — the trunk
        # convs run int8 on the MXU's double-rate path. Opt-in; fidelity is
        # checkpoint-dependent (see docs/PERF.md), validate on your data.
        if quant is None and trunk_int8:
            quant = "trunk"
        if quant not in (None, "trunk", "full"):
            raise ValueError(
                f"quant must be None, 'trunk' or 'full': {quant!r}")
        if quant and forward != "packed":
            # never measure/serve a silently-different configuration: the
            # quantized modes exist only in the packed Pallas forward
            raise ValueError(
                f"quant={quant!r} requires the packed forward (got "
                f"forward={forward!r}: needs a TPU with Pallas available "
                "and img_size divisible by 4)")
        self.quant = quant
        if quant:
            from ducosy_tpu.ops.pallas.instance_norm import INT8_NORM_SCALE

            # surfaced in the bench quant record; DUCOSY_INT8_SCALE moves
            # it (scripts/calibrate_int8.py measures the fidelity curve)
            self.quant_calibration = f"static-{INT8_NORM_SCALE:g}sigma"
        # trunk: auto/xla/pallas/mega/mono — the packed forward's
        # residual-trunk implementation (models/fused.
        # generator_apply_packed); "mega" folds the trunk convs into the
        # Pallas kernels (conv_in.py), "mono" fuses the WHOLE residual
        # block into one kernel (the intermediate never leaves VMEM).
        # Inference has no backward pass, so "auto" resolves to the
        # inference-only fused kernels: chain3 (3 residual blocks per
        # pallas_call — the carry never leaves VMEM inside a chain). The
        # round-4 hardware A/B (scripts/ab_mono.py, docs/PERF.md):
        #   bf16       mega 111.0 -> mono 115.2 -> chain3 117.7 slices/s
        #   trunk-int8 mega 120.2 -> mono 123.3 -> chain3 127.5
        #   full-int8  mega 132.2 ->               chain3 141.7
        # all bit-identical within each mode — the conv taps, CBAM gates
        # and (for quant) int32-accumulator IN stats are the same math in
        # every fused trunk; chaining amortizes kernel dispatch. chain9
        # (whole trunk, one kernel) is a Mosaic compile bomb (>45 min,
        # abandoned — same lesson as the round-2 monolithic backward).
        # Falls back to mono for checkpoints shorter than a chain.
        # generator_apply_packed's own "auto" stays "pallas"
        # (differentiable) for training.
        if trunk == "auto" and forward == "packed":
            from ducosy_tpu.ops.pallas import pallas_available
            if pallas_available():
                gens = ([self.generator] if not self.use_masks else
                        [self.st_generator, self.lung_generator])
                min_blocks = min(g.num_residual_blocks for g in gens)
                trunk = "chain3" if min_blocks >= 3 else "mono"
        elif trunk != "auto":
            # same rule as quant above: never serve (or A/B) a silently
            # different configuration — an explicit trunk needs the packed
            # forward, and the fused trunks need CBAM blocks
            if forward != "packed":
                raise ValueError(
                    f"trunk={trunk!r} requires the packed forward (got "
                    f"forward={forward!r})")
            has_cbam = "ca" in (st_params.get("block0", {}) or {})
            if trunk != "xla" and not has_cbam:
                raise ValueError(
                    f"trunk={trunk!r} needs CBAM checkpoints (the fused "
                    "trunk kernels include the CBAM gates)")
        self.trunk = trunk
        self.compute_dtype = compute_dtype
        self._forward = jax.jit(self._forward_impl,
                                static_argnames=("out_h", "out_w"))

    @classmethod
    def from_torch_checkpoints(cls, st_path: str, lung_path: str, **kw):
        """Load the released .pth A2B generators (generate.py:29-49)."""
        st = generator_params_from_torch(load_torch_state_dict(st_path))
        lung = generator_params_from_torch(load_torch_state_dict(lung_path))
        return cls(st, lung, **kw)

    # ---------------------------------------------------------------- core
    def _gen_apply(self, generator, params, x):
        if self.forward_impl == "packed":
            from ducosy_tpu.models.fused import generator_apply_packed
            return generator_apply_packed(
                params, x,
                num_residual_blocks=generator.num_residual_blocks,
                use_cbam=generator.use_cbam, dtype=self.compute_dtype,
                quant=self.quant, trunk=self.trunk)
        return generator.apply({"params": params}, x)

    def _apply_one(self, params, x):
        return self._gen_apply(self.generator, params, x)

    def _resize_in(self, x):
        """NHWC -> model resolution (antialiased bilinear on image channels;
        the caller resizes masks with `nearest` before upload)."""
        if x.shape[1:3] != (self.img_size, self.img_size):
            x = resize_hw(x.transpose(0, 3, 1, 2), self.img_size,
                          self.img_size).transpose(0, 2, 3, 1)
        return x

    def _forward_impl(self, params, stored, slope, intercept, *,
                      out_h: int, out_w: int, masks=None):
        """(B, H, W) stored pixels (+ optional (B, s, s, M) mask channels at
        model resolution) -> dict of outputs, all on device."""
        hu_img = hu.stored_to_hu(stored, slope, intercept)

        def _norm(rng_cfg):
            if self.soft_squeeze and rng_cfg.use_soft_squeezing:
                # the squeeze expects window-clipped HU (dataset.py
                # applies it after the clip, preprocess.py:43-52)
                clipped = jnp.clip(hu_img, rng_cfg.hu_min, rng_cfg.hu_max)
                return hu.soft_squeeze(clipped, rng_cfg.hu_min,
                                       rng_cfg.hu_max)
            return hu.normalize_window(hu_img, rng_cfg.hu_min,
                                       rng_cfg.hu_max)

        st_in = _norm(self.st_range)
        lung_in = _norm(self.lung_range)
        if not self.use_masks:
            x = jnp.stack([st_in, lung_in])[..., None]   # (2, B, H, W, 1)
            if x.shape[2:4] != (self.img_size, self.img_size):
                x = resize_hw(x.transpose(0, 1, 4, 2, 3), self.img_size,
                              self.img_size).transpose(0, 1, 3, 4, 2)
            # unrolled over the stacked model axis rather than vmapped: the
            # two forwards use different weights (no conv merging is
            # possible) and Pallas kernels don't batch under
            # vmap-inside-lax.map; XLA still schedules both in one program
            p_st = jax.tree_util.tree_map(lambda a: a[0], params)
            p_lung = jax.tree_util.tree_map(lambda a: a[1], params)
            y_st = self._apply_one(p_st, x[0])[..., 0]
            y_lung = self._apply_one(p_lung, x[1])[..., 0]
        else:
            st_x = self._resize_in(st_in[..., None])
            lung_x = self._resize_in(lung_in[..., None])
            # .get, not []: when exactly one model is mask-conditioned
            # (e.g. a framework 3-channel st checkpoint + a released
            # 1-channel lung one) _host_masks only emits that model's key
            st_masks = masks.get("st") if masks else None
            lung_masks = masks.get("lung") if masks else None
            if self.st_channels > 1:
                st_x = jnp.concatenate([st_x, st_masks], axis=-1)
            if self.lung_channels > 1:
                lung_x = jnp.concatenate([lung_x, lung_masks], axis=-1)
            y_st = self._gen_apply(self.st_generator, params["st"],
                                   st_x)[..., 0]
            y_lung = self._gen_apply(self.lung_generator, params["lung"],
                                     lung_x)[..., 0]
        y = jnp.stack([y_st, y_lung])
        if y.shape[-2:] != (out_h, out_w):
            y = resize_hw(y, out_h, out_w)
        st_hu = hu.denormalize_to_hu(y[0], self.st_range.hu_min,
                                     self.st_range.hu_max)
        lung_hu = hu.denormalize_to_hu(y[1], self.lung_range.hu_min,
                                       self.lung_range.hu_max)
        return {
            "st_stored": hu.hu_to_stored(st_hu, slope, intercept),
            "lung_stored": hu.hu_to_stored(lung_hu, slope, intercept),
            "raw_hu": hu_img,
        }

    @staticmethod
    def _masks_threaded(hu_vol: np.ndarray, mask_types,
                        n_workers: int | None = None) -> Dict[str, np.ndarray]:
        """generate_anatomical_masks over z-chunks in parallel threads.

        Every detector is per-slice independent (masks/anatomy.py:190-201
        dispatches through _per_slice), so chunking the z axis is exact.
        scipy/numpy release the GIL in the hot loops; on a production TPU VM
        (~100 vCPUs) this keeps host mask generation ahead of the ~100
        slices/s device pipeline instead of binding it at one core's ~25
        slices/s. Degenerates to a single serial call on 1-CPU hosts."""
        import os as _os
        from ducosy_tpu.masks import generate_anatomical_masks

        if n_workers is None:
            n_workers = min(8, _os.cpu_count() or 1)
        z = hu_vol.shape[0] if hu_vol.ndim == 3 else 1
        if n_workers <= 1 or z < 2 * n_workers:
            return generate_anatomical_masks(hu_vol, mask_types)
        from concurrent.futures import ThreadPoolExecutor
        bounds = np.linspace(0, z, n_workers + 1, dtype=int)
        spans = [(a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
        with ThreadPoolExecutor(max_workers=len(spans)) as pool:
            parts = list(pool.map(
                lambda ab: generate_anatomical_masks(
                    hu_vol[ab[0]:ab[1]], mask_types), spans))
        return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}

    def _host_masks(self, stored: np.ndarray, slope: float,
                    intercept: float) -> Dict[str, np.ndarray]:
        """Generate the conditioning mask channels from raw NCCT HU on the
        host (scipy geometry doesn't XLA-compile; same placement as the
        reference's DataLoader workers). Returns per-model NHWC masks at
        model resolution."""
        from ducosy_tpu.data.dataset import _resize_nearest

        hu_vol = np.asarray(stored, np.float32) * slope + intercept
        needed = set()
        if self.st_channels > 1:
            needed.update(self.st_range.mask_types)
        if self.lung_channels > 1:
            needed.update(self.lung_range.mask_types)
        masks = self._masks_threaded(hu_vol, sorted(needed)) \
            if needed else {}

        def pack(mask_types):
            chans = []
            for name in mask_types:
                m = masks.get(name)
                if m is None:
                    m = np.zeros(hu_vol.shape, np.uint8)
                if m.ndim == 2:
                    m = m[None]
                m = np.stack([_resize_nearest(s.astype(np.float32),
                                              self.img_size) for s in m])
                chans.append(m)
            return np.stack(chans, axis=-1).astype(np.float32)

        out = {}
        if self.st_channels > 1:
            out["st"] = pack(self.st_range.mask_types)
        if self.lung_channels > 1:
            out["lung"] = pack(self.lung_range.mask_types)
        return out

    def generate_batch(self, stored: np.ndarray, slope: float,
                       intercept: float,
                       out_size: Tuple[int, int] | None = None
                       ) -> Dict[str, np.ndarray]:
        """Run a (B, H, W) batch of stored-pixel slices through both models.

        Returns float32 stored-pixel outputs (caller casts to the original
        DICOM dtype, preprocess.py:111) and the raw HU volume for
        synthesis masks."""
        stored_np = np.ascontiguousarray(stored)
        masks = None
        if self.use_masks:
            masks = {k: jnp.asarray(v) for k, v in
                     self._host_masks(stored_np, slope, intercept).items()}
        stored = jnp.asarray(stored_np, jnp.float32)
        out_h, out_w = out_size or stored.shape[-2:]
        out = self._forward(self.params, stored,
                            jnp.float32(slope), jnp.float32(intercept),
                            out_h=out_h, out_w=out_w, masks=masks)
        return {k: np.asarray(v) for k, v in out.items()}

    # ------------------------------------------------- full-patient pipeline
    def run_patient(self, stored_volume: np.ndarray, slope: float,
                    intercept: float, *, chunk: int = 32,
                    pre_z_sigma: float = 0.8, sigma_z: float = 0.7,
                    sigma_xy: float = 0.05, sharpen_amount: float = 1.7,
                    sharpen_radius: float = 1.2) -> np.ndarray:
        """Whole patient on device: chunked dual-model generation,
        complementary compositing (generate.py:218-237), z-gaussian +
        gaussian3d/unsharp volume postprocess (generate.py:254-263) — all
        fused into ONE jitted program (lax.map over slice chunks), so a
        patient costs exactly one dispatch and one transfer each way.
        Returns the final int16 stored-pixel volume."""
        out = self.run_patient_async(
            stored_volume, slope, intercept, chunk=chunk,
            pre_z_sigma=pre_z_sigma, sigma_z=sigma_z, sigma_xy=sigma_xy,
            sharpen_amount=sharpen_amount, sharpen_radius=sharpen_radius)
        return np.asarray(out)

    def prefetch_masks(self, stored_volume: np.ndarray, slope: float,
                       intercept: float):
        """Start computing the conditioning masks (host scipy geometry) in a
        background thread; pass the returned future to run_patient_async's
        `masks=` so mask generation for patient N+1 overlaps device compute
        of patient N instead of serializing with it. No-op (returns None)
        for unconditioned checkpoints."""
        if not self.use_masks:
            return None
        if not hasattr(self, "_mask_pool"):
            from concurrent.futures import ThreadPoolExecutor
            self._mask_pool = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="mask-prefetch")
        vol = np.ascontiguousarray(stored_volume)
        return self._mask_pool.submit(self._host_masks, vol, slope,
                                      intercept)

    def run_patient_async(self, stored_volume: np.ndarray, slope: float,
                          intercept: float, *, chunk: int = 32,
                          pre_z_sigma: float = 0.8, sigma_z: float = 0.7,
                          sigma_xy: float = 0.05, sharpen_amount: float = 1.7,
                          sharpen_radius: float = 1.2, masks=None):
        """Like run_patient but returns the device array without blocking, so
        callers can pipeline patients (upload N+1 while N computes).

        `masks` may be a prefetch_masks future (or its dict result) computed
        from the SAME unpadded volume; when omitted, mask-conditioned
        engines compute them synchronously here.

        When the engine was built with a mesh (see __init__), the slice batch
        inside each chunk is sharded across devices: each of the N chips runs
        chunk/N slices of every generator forward and XLA gathers the volume
        for the z-coupled postprocess — the multi-chip serving path
        (BASELINE.md's v5e-8 target). chunk must divide by the mesh size."""
        z, h, w = stored_volume.shape
        if self.mesh is not None:
            from ducosy_tpu.parallel.mesh import DATA_AXIS
            dp = int(self.mesh.shape.get(DATA_AXIS, 1))
            if chunk % dp:
                raise ValueError(
                    f"chunk={chunk} not divisible by data-axis size {dp}")
            if h % self._sp:
                raise ValueError(
                    f"image height {h} not divisible by sp-axis size "
                    f"{self._sp}")
        pad = (-z) % chunk
        stored = np.concatenate(
            [stored_volume, stored_volume[-1:].repeat(pad, axis=0)]
        ) if pad else stored_volume
        if self.use_masks:
            if masks is None:
                masks = self._host_masks(stored_volume, slope, intercept)
            elif hasattr(masks, "result"):  # a prefetch_masks future
                masks = masks.result()
            if pad:  # padded slices are copies of the last -> copy its mask
                masks = {k: np.concatenate([v, v[-1:].repeat(pad, axis=0)])
                         for k, v in masks.items()}
            masks = {k: jnp.asarray(np.asarray(v).astype(np.int8))
                     for k, v in masks.items()}
        else:
            masks = None
        # upload in the narrow integer dtype (half the bytes over the host
        # link); widened to f32 on device inside the jit
        device_vol = jnp.asarray(stored)
        final = self._run_patient_jit(
            self.params, device_vol, jnp.float32(slope),
            jnp.float32(intercept), masks, chunk=chunk, n_slices=z,
            pre_z_sigma=float(pre_z_sigma), sigma_z=float(sigma_z),
            sigma_xy=float(sigma_xy), sharpen_amount=float(sharpen_amount),
            sharpen_radius=float(sharpen_radius))
        return final

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("chunk", "n_slices", "pre_z_sigma", "sigma_z",
                              "sigma_xy", "sharpen_amount", "sharpen_radius"))
    def _run_patient_jit(self, params, stored, slope, intercept, masks, *,
                         chunk, n_slices, pre_z_sigma, sigma_z, sigma_xy,
                         sharpen_amount, sharpen_radius):
        from ducosy_tpu.infer.postprocess import _postprocess_impl
        from ducosy_tpu.ops.filters import gaussian_filter_1d

        zp, h, w = stored.shape
        stored = stored.astype(jnp.float32)
        n_chunks = zp // chunk
        chunks = stored.reshape(n_chunks, chunk, h, w)
        mask_chunks = None
        if masks is not None:
            mask_chunks = {
                k: v.astype(jnp.float32).reshape(
                    (n_chunks, chunk) + v.shape[1:])
                for k, v in masks.items()}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ducosy_tpu.parallel.mesh import DATA_AXIS, SP_AXIS

            sp = SP_AXIS if SP_AXIS in self.mesh.axis_names else None

            def constrain(x):
                # (n_chunks, chunk, H, W[, M]): slice batch over 'data',
                # image rows over 'sp' (GSPMD inserts the conv halo
                # exchanges and IN-stat partial reductions)
                spec = P(None, DATA_AXIS, sp, *([None] * (x.ndim - 3)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh, spec))

            chunks = constrain(chunks)
            if mask_chunks is not None:
                mask_chunks = {k: constrain(v)
                               for k, v in mask_chunks.items()}

        def body(args):
            sl, mk = args
            out = self._forward_impl(params, sl, slope, intercept,
                                     out_h=h, out_w=w, masks=mk)
            return self._composite(sl, out["raw_hu"], out["st_stored"],
                                   out["lung_stored"])

        merged = jax.lax.map(body, (chunks, mask_chunks))
        merged = merged.reshape(zp, h, w)[:n_slices]
        merged = gaussian_filter_1d(merged, pre_z_sigma, axis=0)
        # NOTE: the reference thresholds the high-density preserve mask on
        # STORED pixel values, not HU — synthesis() feeds raw pixel arrays
        # into postprocess_ct_volume's `volume >= 750` check
        # (generate.py:213-263, postprocess.py:50). Reproduced verbatim.
        return _postprocess_impl(
            merged, method="gaussian3d", enhance_sharpness=True,
            hu_threshold=750.0,
            sigma=1.0, sigma_z=sigma_z, sigma_xy=sigma_xy, base_sigma=1.5,
            max_sigma=3.0, kernel_size=3, process_variance=1e-5,
            measurement_variance=1e-2, sharpen_amount=sharpen_amount,
            sharpen_radius=sharpen_radius)

    @partial(jax.jit, static_argnums=(0,))
    def _composite(self, raw_stored, raw_hu, st_stored, lung_stored):
        """Device-side complementary compositing (generate.py:224-237):
        soft-tissue range overwritten first, lung range second (lung wins the
        shared -150 HU boundary)."""
        st_mask = (raw_hu >= self.st_range.hu_min) & \
            (raw_hu <= self.st_range.hu_max)
        lung_mask = (raw_hu >= self.lung_range.hu_min) & \
            (raw_hu <= self.lung_range.hu_max)
        merged = jnp.where(st_mask, st_stored, raw_stored)
        return jnp.where(lung_mask, lung_stored, merged)
