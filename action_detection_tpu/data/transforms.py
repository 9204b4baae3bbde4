"""Group video transforms: shared-randomness augmentation over frame groups.

Behavioral parity target: /root/reference/transforms.py. The pipeline is
split TPU-first:

* **Host** (this module): decode-adjacent uint8 work that needs PIL's exact
  bilinear resampling for checkpoint parity — multi-scale cropping, scaling,
  flipping, 10-crop oversampling — emitting stacked ``uint8`` numpy arrays.
* **Device** (:func:`normalize_stack`): BGR channel roll, mean/std
  normalization and dtype conversion run inside the jitted model step, fused
  by XLA into the first convolution. No float frame ever crosses PCIe.

All random transforms draw from an explicit ``numpy.random.RandomState`` so a
group (the frames of one proposal) shares one crop/flip decision and runs are
reproducible.
"""

from __future__ import annotations

import numbers
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image, ImageOps
except ImportError:  # pragma: no cover
    Image = None
    ImageOps = None


class GroupScale:
    """Rescale so the smaller edge equals ``size`` (PIL bilinear)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img_group, rng=None):
        out = []
        for img in img_group:
            w, h = img.size
            if (w <= h and w == self.size) or (h <= w and h == self.size):
                out.append(img)
            elif w < h:
                out.append(img.resize((self.size, int(self.size * h / w)),
                                      Image.BILINEAR))
            else:
                out.append(img.resize((int(self.size * w / h), self.size),
                                      Image.BILINEAR))
        return out


class GroupCenterCrop:
    def __init__(self, size: int):
        self.size = (size, size) if isinstance(size, numbers.Number) else size

    def __call__(self, img_group, rng=None):
        # size tuples are (height, width) — torchvision/reference convention
        # (reference transforms.py:27 'th, tw = self.size')
        th, tw = self.size
        out = []
        for img in img_group:
            w, h = img.size
            x1 = int(round((w - tw) / 2.0))
            y1 = int(round((h - th) / 2.0))
            out.append(img.crop((x1, y1, x1 + tw, y1 + th)))
        return out


class GroupRandomCrop:
    def __init__(self, size: int):
        self.size = (size, size) if isinstance(size, numbers.Number) else size

    def __call__(self, img_group, rng: np.random.RandomState):
        w, h = img_group[0].size
        # (height, width) tuple order, as in the reference (transforms.py:27)
        th, tw = self.size
        x1 = rng.randint(0, w - tw + 1)
        y1 = rng.randint(0, h - th + 1)
        out = []
        for img in img_group:
            assert img.size == (w, h)
            if w == tw and h == th:
                out.append(img)
            else:
                out.append(img.crop((x1, y1, x1 + tw, y1 + th)))
        return out


class GroupRandomHorizontalFlip:
    """Flip the whole group with p=0.5; invert flow-x images when flipping."""

    def __init__(self, is_flow: bool = False):
        self.is_flow = is_flow

    def __call__(self, img_group, rng: np.random.RandomState):
        if rng.rand() >= 0.5:
            return img_group
        ret = [img.transpose(Image.FLIP_LEFT_RIGHT) for img in img_group]
        if self.is_flow:
            for i in range(0, len(ret), 2):
                ret[i] = ImageOps.invert(ret[i])
        return ret


class GroupMultiScaleCrop:
    """Fixed-offset multi-scale cropping (the TSN augmentation).

    Crop sizes come from scaling the smaller edge by one of ``scales`` (with
    aspect distortion limited to ``max_distort`` scale steps), placed at one
    of 13 fixed grid offsets, then resized to ``input_size``.
    """

    def __init__(self, input_size, scales=None, max_distort: int = 1,
                 fix_crop: bool = True, more_fix_crop: bool = True):
        self.scales = scales if scales is not None else [1, 0.875, 0.75, 0.66]
        self.max_distort = max_distort
        self.fix_crop = fix_crop
        self.more_fix_crop = more_fix_crop
        self.input_size = ([input_size, input_size]
                           if isinstance(input_size, int) else input_size)

    def __call__(self, img_group, rng: np.random.RandomState):
        im_size = img_group[0].size
        crop_w, crop_h, off_w, off_h = self.sample_crop(im_size, rng)
        out = [img.crop((off_w, off_h, off_w + crop_w, off_h + crop_h))
                  .resize((self.input_size[0], self.input_size[1]), Image.BILINEAR)
               for img in img_group]
        return out

    def sample_crop(self, im_size: Tuple[int, int], rng: np.random.RandomState):
        image_w, image_h = im_size
        base_size = min(image_w, image_h)
        crop_sizes = [int(base_size * s) for s in self.scales]
        crop_h = [self.input_size[1] if abs(x - self.input_size[1]) < 3 else x
                  for x in crop_sizes]
        crop_w = [self.input_size[0] if abs(x - self.input_size[0]) < 3 else x
                  for x in crop_sizes]

        pairs = [(w, h) for i, h in enumerate(crop_h) for j, w in enumerate(crop_w)
                 if abs(i - j) <= self.max_distort]
        crop_pair = pairs[rng.randint(len(pairs))]
        if not self.fix_crop:
            w_off = rng.randint(0, image_w - crop_pair[0] + 1)
            h_off = rng.randint(0, image_h - crop_pair[1] + 1)
        else:
            offsets = fill_fix_offset(self.more_fix_crop, image_w, image_h,
                                      crop_pair[0], crop_pair[1])
            w_off, h_off = offsets[rng.randint(len(offsets))]
        return crop_pair[0], crop_pair[1], w_off, h_off


def fill_fix_offset(more_fix_crop: bool, image_w: int, image_h: int,
                    crop_w: int, crop_h: int) -> List[Tuple[int, int]]:
    """The 5 (or 13) fixed crop anchor offsets of the TSN augmentation."""
    w_step = (image_w - crop_w) // 4
    h_step = (image_h - crop_h) // 4
    ret = [(0, 0), (4 * w_step, 0), (0, 4 * h_step), (4 * w_step, 4 * h_step),
           (2 * w_step, 2 * h_step)]
    if more_fix_crop:
        ret += [(0, 2 * h_step), (4 * w_step, 2 * h_step),
                (2 * w_step, 4 * h_step), (2 * w_step, 0),
                (1 * w_step, 1 * h_step), (3 * w_step, 1 * h_step),
                (1 * w_step, 3 * h_step), (3 * w_step, 3 * h_step)]
    return ret


class GroupRandomSizedCrop:
    """Inception-style random area (0.08-1.0) + aspect (3/4-4/3) crop,
    resized to ``size`` (transforms.py:209-253 parity)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img_group, rng: np.random.RandomState):
        w0, h0 = img_group[0].size
        for _ in range(10):
            area = w0 * h0
            target_area = rng.uniform(0.08, 1.0) * area
            aspect_ratio = rng.uniform(3.0 / 4, 4.0 / 3)
            w = int(round(np.sqrt(target_area * aspect_ratio)))
            h = int(round(np.sqrt(target_area / aspect_ratio)))
            if rng.rand() < 0.5:
                w, h = h, w
            if w <= w0 and h <= h0:
                x1 = rng.randint(0, w0 - w + 1)
                y1 = rng.randint(0, h0 - h + 1)
                return [img.crop((x1, y1, x1 + w, y1 + h))
                           .resize((self.size, self.size), Image.BILINEAR)
                        for img in img_group]
        # fallback: scale + random crop
        scaled = GroupScale(self.size)(img_group)
        return GroupRandomCrop(self.size)(scaled, rng)


class GroupOverSample:
    """10-crop test oversampling: 5 fixed crops x {identity, flip}.

    Output group layout matches the reference: for each offset, all frames
    cropped, then all frames flipped (flow-x inverted on flip).
    """

    def __init__(self, crop_size, scale_size: Optional[int] = None):
        self.crop_size = ((crop_size, crop_size) if isinstance(crop_size, int)
                          else crop_size)
        self.scale_worker = GroupScale(scale_size) if scale_size else None

    def __call__(self, img_group, rng=None):
        if self.scale_worker is not None:
            img_group = self.scale_worker(img_group)
        image_w, image_h = img_group[0].size
        crop_w, crop_h = self.crop_size
        offsets = fill_fix_offset(False, image_w, image_h, crop_w, crop_h)

        oversample_group = []
        for o_w, o_h in offsets:
            normal_group, flip_group = [], []
            for i, img in enumerate(img_group):
                crop = img.crop((o_w, o_h, o_w + crop_w, o_h + crop_h))
                normal_group.append(crop)
                flip_crop = crop.copy().transpose(Image.FLIP_LEFT_RIGHT)
                if img.mode == "L" and i % 2 == 0:
                    flip_group.append(ImageOps.invert(flip_crop))
                else:
                    flip_group.append(flip_crop)
            oversample_group.extend(normal_group)
            oversample_group.extend(flip_group)
        return oversample_group


class Stack:
    """Stack a PIL group into one ``uint8`` array ``(H, W, C_total)``.

    Gray (flow) images stack 1 channel each; RGB images stack 3. BGR rolling
    is deliberately NOT done here — it happens on device in
    :func:`normalize_stack` so the host stays pure uint8 memcpy.
    """

    def __call__(self, img_group, rng=None):
        if img_group[0].mode == "L":
            return np.stack([np.asarray(img, dtype=np.uint8) for img in img_group],
                            axis=2)
        return np.concatenate([np.asarray(img, dtype=np.uint8) for img in img_group],
                              axis=2)


class Compose:
    """Chain group transforms, threading the shared RandomState through."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img_group, rng: Optional[np.random.RandomState] = None):
        rng = rng or np.random.RandomState()
        for t in self.transforms:
            img_group = t(img_group, rng)
        return img_group


def get_train_augmentation(input_size: int, modality: str) -> Compose:
    """The reference's per-modality training augmentation (ssn_models.py:386-395)."""
    if modality == "RGB":
        return Compose([GroupMultiScaleCrop(input_size, [1, 0.875, 0.75, 0.66]),
                        GroupRandomHorizontalFlip(is_flow=False)])
    if modality == "Flow":
        return Compose([GroupMultiScaleCrop(input_size, [1, 0.875, 0.75]),
                        GroupRandomHorizontalFlip(is_flow=True)])
    if modality == "RGBDiff":
        return Compose([GroupMultiScaleCrop(input_size, [1, 0.875, 0.75]),
                        GroupRandomHorizontalFlip(is_flow=False)])
    raise ValueError(f"unknown modality {modality}")


def device_oversample(frames, crop_size: int, modality: str = "RGB"):
    """10-crop oversample on device (jittable): the 5 fixed offsets x flip.

    Host ships ONE scale-size frame per tick instead of 10 crops — ~6-10x
    less PCIe traffic on the dense-scoring hot path (the offsets are static
    integer math, transforms.py:150-162 / reference transforms.py:99-132, so
    the crops here are bit-identical to the host ``GroupOverSample`` output).

    Args:
      frames: ``(N, H, W, C)`` uint8 scale-size frames (shorter side already
        resized to scale_size on host — PIL bilinear parity is kept there).
      crop_size: square crop side.
      modality: 'Flow' inverts the flow-x channels (even channel indices) of
        flipped crops, matching ``ImageOps.invert`` on L images.

    Returns:
      ``(10*N, crop_size, crop_size, C)`` crop-major, in the reference's
      ``GroupOverSample`` order: [o0, o0-flip, o1, o1-flip, ...].
    """
    import jax.numpy as jnp

    _, H, W, C = frames.shape
    groups = []
    for o_w, o_h in fill_fix_offset(False, W, H, crop_size, crop_size):
        crop = frames[:, o_h:o_h + crop_size, o_w:o_w + crop_size, :]
        flip = crop[:, :, ::-1, :]
        if modality == "Flow":
            is_x = (jnp.arange(C) % 2 == 0)
            flip = jnp.where(is_x[None, None, None, :],
                             jnp.asarray(255, frames.dtype) - flip, flip)
        groups.extend((crop, flip))
    out = jnp.stack(groups, axis=0)          # (10, N, cs, cs, C)
    return out.reshape((-1,) + out.shape[2:])


def device_normed_pair(frames, spec, modality: str = "RGB",
                       new_length: int = 1, dtype=None):
    """Normalized frames + the flip SOURCE tensor (jittable).

    Returns ``(xn, flip_src)``: ``xn`` is the normalized frames, ``flip_src``
    is what horizontal flips must be cut from — identical to ``xn`` except
    Flow, whose flow-x planes are inverted on flip (``ImageOps.invert``
    happens on uint8 BEFORE normalization in the composed host path, so the
    inverted planes are normalized from ``255 - frames`` directly — still
    elementwise, still bit-identical). Shared by the 10-crop oversample and
    the shared-stem scorer path.
    """
    import jax.numpy as jnp

    xn = preprocess_frames(frames, spec, modality, new_length, dtype=dtype)
    if modality == "Flow":
        inv = preprocess_frames(jnp.asarray(255, frames.dtype) - frames, spec,
                                modality, new_length, dtype=dtype)
        is_x = (jnp.arange(xn.shape[-1]) % 2 == 0)
        flip_src = jnp.where(is_x[None, None, None, :], inv, xn)
    else:
        flip_src = xn
    return xn, flip_src


def device_oversample_normed(frames, spec, modality: str = "RGB",
                             new_length: int = 1,
                             crop_size: Optional[int] = None, dtype=None):
    """Fused normalize-then-oversample (jittable), bit-identical to
    ``preprocess_frames(device_oversample(frames, crop_size, modality), ...)``.

    Normalization is elementwise in the pixel value, so it commutes exactly
    with cropping and horizontal flips; running it on the N scale-size frames
    instead of the 10N crops touches ~5.8x fewer pixels (340x256 vs 10x224^2)
    and measured 1.5-2 ms faster per 640-image step on one v5e
    (scripts/fullstep_probe.py, max |delta| = 0.0 vs the crop-first order).

    The Flow flip inversion (``ImageOps.invert`` on flow-x planes,
    reference transforms.py:110-114) happens on uint8 BEFORE normalization in
    the composed path, so here the inverted planes are normalized from
    ``255 - frames`` directly — still elementwise, still bit-identical.
    RGBDiff's consecutive-frame differences are per-pixel across the channel
    axis, so they also commute with crop/flip (flips never invert RGBDiff,
    matching GroupOverSample's L-mode-only invert).

    Args:
      frames: ``(N, H, W, C)`` uint8 scale-size frames.
      spec: backbone ``InputSpec`` (mean/std/bgr/div255 + input_size).
      crop_size: square crop side (default ``spec.input_size``).

    Returns ``(10*N, crop_size, crop_size, C')`` normalized crops in
    GroupOverSample order [o0, o0-flip, o1, o1-flip, ...].
    """
    import jax.numpy as jnp

    crop_size = crop_size or spec.input_size
    xn, flip_src = device_normed_pair(frames, spec, modality, new_length,
                                      dtype=dtype)
    _, H, W, _ = xn.shape
    groups = []
    for o_w, o_h in fill_fix_offset(False, W, H, crop_size, crop_size):
        crop = xn[:, o_h:o_h + crop_size, o_w:o_w + crop_size, :]
        flip = flip_src[:, o_h:o_h + crop_size, o_w:o_w + crop_size, :][:, :, ::-1, :]
        groups.extend((crop, flip))
    out = jnp.stack(groups, axis=0)
    return out.reshape((-1,) + out.shape[2:])


def normalize_stack(frames, mean, std, bgr: bool = False, div255: bool = False,
                    channels_per_image: int = 3, dtype=None):
    """Device-side normalization of stacked uint8 frames (jittable).

    Args:
      frames: ``(..., H, W, C_total)`` uint8 (or float) stacked frames.
      mean/std: per-channel statistics, tiled across stacked images.
      bgr: reverse channel order within each image's channel group (the
        Caffe-port ``Stack(roll=True)`` of transforms.py:256-268).
      channels_per_image: 3 for RGB frames, 1 for flow planes.

    Returns float32 (or ``dtype``) normalized frames.
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    x = frames.astype(dtype)
    if div255:
        x = x / 255.0
    c_total = x.shape[-1]
    n_img = c_total // channels_per_image
    if bgr and channels_per_image == 3:
        x = x.reshape(x.shape[:-1] + (n_img, channels_per_image))
        x = x[..., ::-1]
        x = x.reshape(x.shape[:-2] + (c_total,))
    mean = jnp.asarray(mean, dtype=dtype)
    std = jnp.asarray(std, dtype=dtype)
    mean = jnp.tile(mean, c_total // mean.shape[0])
    std = jnp.tile(std, c_total // std.shape[0])
    return (x - mean) / std


def preprocess_frames(frames, spec, modality: str = "RGB", new_length: int = 1,
                      dtype=None):
    """Full device-side preprocessing for any modality.

    RGB/Flow: normalize with the backbone's input statistics. RGBDiff: BGR
    roll then consecutive-frame differences with no mean/std (the reference
    trains RGBDiff with IdentityTransform normalization, ssn_train.py:88-90).
    """
    if modality == "RGBDiff":
        x = normalize_stack(frames, (0.0,), (1.0,), bgr=spec.bgr,
                            div255=spec.div255, channels_per_image=3,
                            dtype=dtype)
        return rgb_diff(x, new_length)
    channels = 1 if modality == "Flow" else 3
    return normalize_stack(frames, spec.mean, spec.std, bgr=spec.bgr,
                           div255=spec.div255, channels_per_image=channels,
                           dtype=dtype)


def rgb_diff(frames, new_length: int, keep_rgb: bool = False):
    """Consecutive-frame RGB differences on device (the RGBDiff modality).

    Args:
      frames: ``(..., H, W, 3*(new_length+1))`` stacked frames per segment.
      new_length: number of diffs produced.

    Returns ``(..., H, W, 3*new_length)`` (or ``3*(new_length+1)`` with
    keep_rgb) — the reference's ``_get_diff`` (ssn_models.py:302-316) computed
    once on device instead of with in-place tensor surgery.
    """
    import jax.numpy as jnp

    shape = frames.shape
    n_frames = shape[-1] // 3
    assert n_frames == new_length + 1, (n_frames, new_length)
    x = frames.reshape(shape[:-1] + (n_frames, 3))
    diffs = x[..., 1:, :] - x[..., :-1, :]
    if keep_rgb:
        out = jnp.concatenate([x[..., :1, :], diffs], axis=-2)
        return out.reshape(shape[:-1] + (3 * (new_length + 1),))
    return diffs.reshape(shape[:-1] + (3 * new_length,))
