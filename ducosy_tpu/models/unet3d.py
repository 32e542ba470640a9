"""3-D U-Net HU difference-map predictor (the "nmodel").

Rebuild of modules/nmodel/model.py:7-163 — dormant in the reference's
synthesis path (imported but commented out at generate.py:14,147-149) yet
part of the API surface. NDHWC layout; depth axis is never pooled
(maxpool/upsample (1,2,2)) so thin CT stacks keep their z resolution.

  UNet3D      4 down stages, base 32 channels (reference :80-122)
  UNet3DLight 3 down stages, base 16 channels (reference :125-163)

Upsampling is spatial-only trilinear with align_corners=True semantics
(reference Up, :48); BatchNorm replaces the reference's nn.BatchNorm3d with
running statistics stored in the `batch_stats` collection.

HU normalization contract (modules/nmodel/dataset.py:169-208):
  normalize_hu:  clip [-1024, 3071] -> [-1, 1]
  normalize_diff / denormalize_diff: clip [0, 4000] <-> [-1, 1]
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

HU_MIN, HU_MAX = -1024.0, 3071.0
DIFF_MIN, DIFF_MAX = 0.0, 4000.0


def normalize_hu(volume, min_hu=HU_MIN, max_hu=HU_MAX):
    volume = jnp.clip(volume, min_hu, max_hu)
    return (volume - min_hu) / (max_hu - min_hu) * 2.0 - 1.0


def denormalize_hu(volume, min_hu=HU_MIN, max_hu=HU_MAX):
    return (volume + 1.0) / 2.0 * (max_hu - min_hu) + min_hu


def normalize_diff(diff, min_diff=DIFF_MIN, max_diff=DIFF_MAX):
    diff = jnp.clip(diff, min_diff, max_diff)
    return (diff - min_diff) / (max_diff - min_diff) * 2.0 - 1.0


def denormalize_diff(diff, min_diff=DIFF_MIN, max_diff=DIFF_MAX):
    return (diff + 1.0) / 2.0 * (max_diff - min_diff) + min_diff


def _upsample_hw_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x spatial upsample of NDHWC with torch align_corners=True linear
    interpolation (out coord i samples in coord i*(in-1)/(out-1))."""
    def interp_axis(arr, axis):
        n_in = arr.shape[axis]
        n_out = n_in * 2
        if n_in == 1:
            return jnp.repeat(arr, 2, axis=axis)
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, n_in - 1)
        w = jnp.asarray((pos - lo), arr.dtype)
        shape = [1] * arr.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        a = jnp.take(arr, jnp.asarray(lo), axis=axis)
        b = jnp.take(arr, jnp.asarray(hi), axis=axis)
        return a * (1 - w) + b * w

    x = interp_axis(x, 2)  # H
    x = interp_axis(x, 3)  # W
    return x


class DoubleConv(nn.Module):
    """(Conv3D -> BN -> ReLU) x2 (reference DoubleConv, :7-24)."""

    out_channels: int
    mid_channels: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        mid = self.mid_channels or self.out_channels
        for i, ch in enumerate((mid, self.out_channels)):
            x = nn.Conv(ch, (3, 3, 3), padding=1, use_bias=False,
                        name=f"conv{i + 1}", dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             name=f"bn{i + 1}", dtype=jnp.float32)(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    """Spatial-only maxpool (1,2,2) + DoubleConv (reference Down, :27-39)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.max_pool(x, window_shape=(1, 2, 2), strides=(1, 2, 2))
        return DoubleConv(self.out_channels, dtype=self.dtype,
                          name="conv")(x, train=train)


class Up(nn.Module):
    """Spatial trilinear x2 upsample, skip concat, DoubleConv
    (reference Up, :42-68, trilinear variant)."""

    out_channels: int
    mid_channels: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, *, train: bool):
        x1 = _upsample_hw_align_corners(x1)
        # center-pad to the skip's shape (reference :58-65)
        pads = []
        for axis in (1, 2, 3):
            diff = x2.shape[axis] - x1.shape[axis]
            pads.append((diff // 2, diff - diff // 2))
        x1 = jnp.pad(x1, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_channels, self.mid_channels,
                          dtype=self.dtype, name="conv")(x, train=train)


class UNet3D(nn.Module):
    """Standard 4-down 3-D U-Net (reference UNet3D, :80-122)."""

    n_channels: int = 1
    n_classes: int = 1
    base_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.base_channels
        x1 = DoubleConv(c, dtype=self.dtype, name="inc")(x, train=train)
        x2 = Down(c * 2, dtype=self.dtype, name="down1")(x1, train=train)
        x3 = Down(c * 4, dtype=self.dtype, name="down2")(x2, train=train)
        x4 = Down(c * 8, dtype=self.dtype, name="down3")(x3, train=train)
        x5 = Down(c * 8, dtype=self.dtype, name="down4")(x4, train=train)
        x = Up(c * 4, c * 8, dtype=self.dtype, name="up1")(
            x5, x4, train=train)
        x = Up(c * 2, c * 4, dtype=self.dtype, name="up2")(
            x, x3, train=train)
        x = Up(c, c * 2, dtype=self.dtype, name="up3")(x, x2, train=train)
        x = Up(c, c, dtype=self.dtype, name="up4")(x, x1, train=train)
        return nn.Conv(self.n_classes, (1, 1, 1), name="outc",
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class UNet3DLight(nn.Module):
    """3-down memory-light variant (reference UNet3DLight, :125-163)."""

    n_channels: int = 1
    n_classes: int = 1
    base_channels: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.base_channels
        x1 = DoubleConv(c, dtype=self.dtype, name="inc")(x, train=train)
        x2 = Down(c * 2, dtype=self.dtype, name="down1")(x1, train=train)
        x3 = Down(c * 4, dtype=self.dtype, name="down2")(x2, train=train)
        x4 = Down(c * 4, dtype=self.dtype, name="down3")(x3, train=train)
        x = Up(c * 2, c * 4, dtype=self.dtype, name="up1")(
            x4, x3, train=train)
        x = Up(c, c * 2, dtype=self.dtype, name="up2")(x, x2, train=train)
        x = Up(c, c, dtype=self.dtype, name="up3")(x, x1, train=train)
        return nn.Conv(self.n_classes, (1, 1, 1), name="outc",
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


def predict_volume(model, variables, vue_volume: np.ndarray,
                   *, slice_batch: int = 8) -> np.ndarray:
    """HU volume (D, H, W) -> predicted HU difference map.

    Matches modules/nmodel/inference.py:65-82 but as ONE fused XLA program:
    normalize, lax.map the net over slice_batch-sized chunks (each slice a
    depth-1 3-D volume, the reference's (1, 512, 512) patch shape), and
    denormalize — a single dispatch and one transfer each way, like the
    CycleGAN engine, instead of the reference's per-slice loop with a host
    round trip per batch."""
    d, h, w = vue_volume.shape
    pad = (-d) % slice_batch

    @jax.jit
    def run(vol):
        v = normalize_hu(vol.astype(jnp.float32))
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad, h, w), v.dtype)])
        x = v.reshape(-1, slice_batch, h, w)[:, :, None, :, :, None]

        def body(chunk):
            return model.apply(variables, chunk, train=False)

        out = jax.lax.map(body, x)  # (n_chunks, slice_batch, 1, H, W, 1)
        out = out.reshape(-1, h, w)[:d]
        return denormalize_diff(out)

    return np.asarray(run(jnp.asarray(vue_volume)))


# ------------------------------------------------------------ torch interop
def _c3(w):
    """torch Conv3d (O,I,D,H,W) -> flax (D,H,W,I,O)."""
    a = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
    return a.transpose(2, 3, 4, 1, 0)


def unet3d_params_from_torch(state_dict):
    """Torch UNet3D(Light) state dict -> (params, batch_stats) matching our
    module tree. Handles the reference's checkpoint layout
    (modules/nmodel/inference.py:17-62)."""
    import numpy as _np

    def tnp(t):
        return _np.asarray(t.detach().cpu().numpy()
                           if hasattr(t, "detach") else t)

    params, stats = {}, {}

    def put_double_conv(dst_p, dst_s, prefix):
        for i, idx in enumerate((0, 3)):
            conv_name = f"conv{i + 1}"
            bn_name = f"bn{i + 1}"
            dst_p[conv_name] = {
                "kernel": _c3(state_dict[f"{prefix}.{idx}.weight"])}
            dst_p[bn_name] = {
                "scale": tnp(state_dict[f"{prefix}.{idx + 1}.weight"]),
                "bias": tnp(state_dict[f"{prefix}.{idx + 1}.bias"])}
            dst_s[bn_name] = {
                "mean": tnp(state_dict[f"{prefix}.{idx + 1}.running_mean"]),
                "var": tnp(state_dict[f"{prefix}.{idx + 1}.running_var"])}

    def module(name, torch_prefix):
        p, s = {}, {}
        put_double_conv(p, s, torch_prefix)
        params[name] = {"conv": p} if name != "inc" else p
        stats[name] = {"conv": s} if name != "inc" else s

    module("inc", "inc.double_conv")
    n_down = 4 if any("down4" in k for k in state_dict) else 3
    for i in range(1, n_down + 1):
        module(f"down{i}", f"down{i}.maxpool_conv.1.double_conv")
    for i in range(1, n_down + 1):
        module(f"up{i}", f"up{i}.conv.double_conv")
    params["outc"] = {"kernel": _c3(state_dict["outc.conv.weight"]),
                      "bias": tnp(state_dict["outc.conv.bias"])}
    return params, stats


def load_model(checkpoint_path: str):
    """Reference-compatible loader (inference.py:17-62): introspects the
    torch checkpoint for the model class (down4 presence) and base channels;
    returns (module, variables)."""
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu",
                      weights_only=False)
    state_dict = ckpt.get("model_state_dict", ckpt)
    has_down4 = any("down4" in k for k in state_dict)
    first = state_dict["inc.double_conv.0.weight"]
    base_channels = int(first.shape[0])
    in_channels = int(first.shape[1])
    cls = UNet3D if has_down4 else UNet3DLight
    model = cls(n_channels=in_channels, n_classes=1,
                base_channels=base_channels)
    params, batch_stats = unet3d_params_from_torch(state_dict)
    return model, {"params": params, "batch_stats": batch_stats}


def normalize_volume_to_uint8(volume: np.ndarray) -> np.ndarray:
    """Global min-max normalize a (Z, H, W) volume to uint8 (reference
    `nomalize_volume`, inference.py:139-152); flat volumes map to 128."""
    volume = np.asarray(volume)
    gmin, gmax = float(volume.min()), float(volume.max())
    if gmax > gmin:
        out = (volume - gmin) / (gmax - gmin) * 255.0
        return out.astype(np.uint8)
    return np.full(volume.shape, 128, np.uint8)


def save_results(predicted_diff: np.ndarray, output_dir: str,
                 base_name: str, original_volume: np.ndarray | None = None
                 ) -> dict:
    """Dump a predicted HU difference map like the reference's
    `save_results` (modules/nmodel/inference.py:85-136): the diff volume as
    `{base}_predicted_diff.npy`, per-slice globally-normalized grayscale
    PNGs under `{base}_diff_slices/slice_{i:04d}.png`, and — when the
    original NCCT volume is given — the combined (original + diff) `.npy`
    plus its own slice PNG set. PIL stands in for the reference's cv2.
    Returns the written paths."""
    import os

    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    predicted_diff = np.asarray(predicted_diff, np.float32)
    written = {}

    volume_path = os.path.join(output_dir, f"{base_name}_predicted_diff.npy")
    np.save(volume_path, predicted_diff)
    written["diff_volume"] = volume_path

    def dump_slices(volume, subdir):
        slice_dir = os.path.join(output_dir, subdir)
        os.makedirs(slice_dir, exist_ok=True)
        for i, img in enumerate(normalize_volume_to_uint8(volume)):
            Image.fromarray(img, mode="L").save(
                os.path.join(slice_dir, f"slice_{i:04d}.png"))
        return slice_dir

    written["diff_slices"] = dump_slices(predicted_diff,
                                         f"{base_name}_diff_slices")

    if original_volume is not None:
        combined = np.asarray(original_volume, np.float32) + predicted_diff
        combined_path = os.path.join(output_dir, f"{base_name}_combined.npy")
        np.save(combined_path, combined)
        written["combined_volume"] = combined_path
        written["combined_slices"] = dump_slices(
            combined, f"{base_name}_combined_slices")
    return written
