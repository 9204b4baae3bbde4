"""Host input pipeline: frame providers, batch assembly, threaded prefetch.

Replaces the reference's torch DataLoader worker processes
(/root/reference/ssn_train.py:99-114) with a thread pool + double-buffered
prefetcher feeding static-shape uint8 batches. Decoding/augmentation stays on
host (PIL bilinear parity); normalization runs on device inside the jitted
step (see data/transforms.py).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .ssn_dataset import SSNDataset, TrainSample
from .transforms import Compose, GroupOverSample, GroupScale, GroupCenterCrop, Stack


class DirectoryFrameProvider:
    """Loads extracted JPEG frames from per-video directories.

    ``image_tmpl``: 'img_{:05d}.jpg' (RGB) or '{}_{:05d}.jpg' (flow, formatted
    with 'x'/'y' + index), matching the reference's layout (ssn_dataset.py:187-194).
    """

    def __init__(self, root: str = "", image_tmpl: str = "img_{:05d}.jpg",
                 modality: str = "RGB"):
        self.root = root
        self.image_tmpl = image_tmpl
        self.modality = modality

    def load(self, video_id: str, idx: int):
        import os

        from PIL import Image

        directory = os.path.join(self.root, video_id)
        if self.modality in ("RGB", "RGBDiff"):
            return [Image.open(os.path.join(
                directory, self.image_tmpl.format(idx))).convert("RGB")]
        x_img = Image.open(os.path.join(
            directory, self.image_tmpl.format("x", idx))).convert("L")
        y_img = Image.open(os.path.join(
            directory, self.image_tmpl.format("y", idx))).convert("L")
        return [x_img, y_img]


class SyntheticFrameProvider:
    """Deterministic pseudo-random frames keyed by (video_id, frame index).

    The fake data source the reference lacks: lets the full pipeline (and the
    benchmark) run without any frame directory.
    """

    def __init__(self, width: int = 340, height: int = 256, modality: str = "RGB",
                 seed: int = 0):
        self.width = width
        self.height = height
        self.modality = modality
        self.seed = seed

    def load(self, video_id: str, idx: int):
        import zlib

        from PIL import Image

        # stable across processes (builtin hash() is salted per process)
        key = zlib.crc32(f"{self.seed}/{video_id}/{int(idx)}".encode())
        rng = np.random.RandomState(key)
        if self.modality in ("RGB", "RGBDiff"):
            arr = rng.randint(0, 256, size=(self.height, self.width, 3), dtype=np.uint8)
            return [Image.fromarray(arr, "RGB")]
        x = rng.randint(0, 256, size=(self.height, self.width), dtype=np.uint8)
        y = rng.randint(0, 256, size=(self.height, self.width), dtype=np.uint8)
        return [Image.fromarray(x, "L"), Image.fromarray(y, "L")]


def frames_per_segment(modality: str, new_length: int) -> int:
    """Frames fetched per segment: RGBDiff needs new_length+1 raw frames to
    produce new_length differences on device."""
    return new_length + 1 if modality == "RGBDiff" else new_length


def load_proposal_frames(provider, video_id: str, frame_indices: Sequence[int],
                         frame_cnt: int, new_length: int = 1) -> List:
    """PIL frames for one proposal's segments: for each segment start ``p``,
    frames ``min(frame_cnt, p + x)`` for x in [0, n)  where n accounts for the
    RGBDiff extra frame."""
    n = frames_per_segment(provider.modality, new_length)
    frames = []
    for p in frame_indices:
        for x in range(n):
            frames.extend(provider.load(video_id, min(int(frame_cnt), int(p) + x)))
    return frames


def assemble_train_batch(dataset: SSNDataset, video_indices: Sequence[int],
                         provider, augmentation: Compose,
                         rng: np.random.RandomState,
                         random_shift: bool = True) -> Dict[str, np.ndarray]:
    """Build one static-shape uint8 training batch.

    Returns dict with:
      frames     (B*P, S, H, W, C) uint8
      scaling    (B*P, 2) f32
      labels     (B*P,) i64
      reg_targets(B*P, 2) f32
      prop_type  (B*P,) i64
    """
    all_frames, all_scaling, all_labels, all_reg, all_type = [], [], [], [], []
    S = dataset.body_seg + 2 * dataset.aug_seg
    L = dataset.new_length
    for vi in video_indices:
        sample = dataset.get_training_sample(vi, rng, random_shift=random_shift)
        for i in range(sample.frame_indices.shape[0]):
            vid = sample.frame_video_ids[i]
            frame_cnt = dataset.video_dict[vid].num_frames
            pil_frames = load_proposal_frames(provider, vid,
                                              sample.frame_indices[i], frame_cnt, L)
            aug = augmentation(pil_frames, rng)
            stacked = Stack()(aug)                      # (H, W, n_img * c)
            H, W, C_total = stacked.shape
            # regroup to (S, H, W, C_in): C_in = channels per segment
            c_in = C_total // S
            seg = stacked.reshape(H, W, S, c_in).transpose(2, 0, 1, 3)
            all_frames.append(seg)
        all_scaling.append(sample.scaling)
        all_labels.append(sample.labels)
        all_reg.append(sample.reg_targets)
        all_type.append(sample.prop_type)

    return {
        "frames": np.stack(all_frames).astype(np.uint8),
        "scaling": np.concatenate(all_scaling),
        "labels": np.concatenate(all_labels),
        "reg_targets": np.concatenate(all_reg),
        "prop_type": np.concatenate(all_type),
    }


def make_test_transform(crop_size: int, scale_size: int, test_crops: int) -> Compose:
    """10-crop oversample or scale+center-crop, as in ssn_test.py:106-117."""
    if test_crops == 1:
        return Compose([GroupScale(scale_size), GroupCenterCrop(crop_size)])
    if test_crops == 10:
        return Compose([GroupOverSample(crop_size, scale_size)])
    raise ValueError(f"unsupported number of crops {test_crops}")


def make_decode_pool(threads: Optional[int] = None
                     ) -> Optional[ThreadPoolExecutor]:
    """Thread pool for parallel JPEG decode on the inference hot path.

    PIL releases the GIL inside libjpeg, so a few threads pay off even on one
    core; beyond ~2x cores they only thrash. Returns None for threads <= 1.
    """
    import os

    if threads is None:
        threads = min(8, 2 * (os.cpu_count() or 1))
    if threads <= 1:
        return None
    return ThreadPoolExecutor(max_workers=threads)


def iter_windowed_decode(jobs: Sequence, load_one: Callable,
                         executor: Optional[ThreadPoolExecutor],
                         window: int) -> Iterator:
    """Yield ``load_one(job)`` for each job in order, decoding up to ``window``
    jobs ahead on ``executor`` — the chip stays fed without piling the whole
    video's decoded frames in host RAM. Synchronous when executor is None."""
    if executor is None:
        for job in jobs:
            yield load_one(job)
        return
    futures: dict = {}
    n = len(jobs)
    for j in range(n):
        for k in range(j, min(j + window, n)):
            if k not in futures:
                futures[k] = executor.submit(load_one, jobs[k])
        yield futures.pop(j).result()


def pad_chunk_ticks(chunk: np.ndarray, host_crops: int,
                    batch_ticks: int) -> np.ndarray:
    """Pad a crop-major ``(host_crops * n_ticks, ...)`` chunk to the static
    ``batch_ticks`` tick count (zero ticks appended per crop block)."""
    n_ticks = chunk.shape[0] // host_crops
    if n_ticks == batch_ticks:
        return chunk
    c = chunk.reshape(host_crops, n_ticks, *chunk.shape[1:])
    c = np.pad(c, ((0, 0), (0, batch_ticks - n_ticks))
               + ((0, 0),) * (c.ndim - 2))
    return c.reshape(host_crops * batch_ticks, *chunk.shape[1:])


def iter_test_frame_batches(provider, video_id: str, frame_ticks: np.ndarray,
                            frame_cnt: int, transform: Compose,
                            new_length: int = 1, batch_ticks: int = 32,
                            num_segments_per_stack: Optional[int] = None
                            ) -> Iterator[np.ndarray]:
    """Yield uint8 arrays ``(crops * n_ticks, H, W, C_in)`` for dense scoring.

    The stack order is crop-major, tick-minor (the 10-crop transform emits all
    ticks for crop 0, then crop 0 flipped, ...), matching the reference's
    ``view(num_crop, -1, dim).mean(0)`` crop averaging (ssn_test.py:84) — the
    scorer reshapes to ``(crops, n_ticks, ...)`` and means over crops.
    """
    n = len(frame_ticks)
    for lo in range(0, n, batch_ticks):
        ticks = frame_ticks[lo: lo + batch_ticks]
        pil_frames = load_proposal_frames(provider, video_id, ticks, frame_cnt,
                                          new_length)
        out = transform(pil_frames)
        stacked = Stack()(out)                          # (H, W, crops * n_img * c)
        H, W, C_total = stacked.shape
        # channels per tick-stack: new_length frames x channels each
        n_per_tick = frames_per_segment(provider.modality, new_length)
        imgs_per_tick = (2 if provider.modality == "Flow" else 1) * n_per_tick
        c_img = 1 if provider.modality == "Flow" else 3
        c_in = imgs_per_tick * c_img
        total_stacks = C_total // c_in
        seg = stacked.reshape(H, W, total_stacks, c_in).transpose(2, 0, 1, 3)
        yield seg


def collect_calibration_frames(dataset, provider, transform,
                               new_length: int = 1,
                               max_videos: int = 8) -> Optional[np.ndarray]:
    """Frames spread across several test videos for int8 calibration.

    Max-abs calibration from one video under-covers the activation range of
    the rest, so this takes one tick-batch from up to ``max_videos`` videos
    spread across the list. Zero-tick videos (``num_frames <= new_length``,
    e.g. THUMOS shorts under Flow's new_length=5) are skipped and replaced by
    the next unseen index so sparse empties don't starve calibration; returns
    None when every video is empty (there is nothing to score then either —
    callers fall back to lazy or no calibration).

    Shared by ``ssn_test`` and ``binary_test`` so the two CLIs cannot
    diverge on calibration policy.
    """
    n_vids = len(dataset.video_list)
    if n_vids == 0:
        return None
    target = min(max_videos, n_vids)
    spread = list(dict.fromkeys(
        np.linspace(0, n_vids - 1, target).astype(int).tolist()))
    seen = set(spread)
    order = spread + [i for i in range(n_vids) if i not in seen]
    chunks: List[np.ndarray] = []
    for i in order:
        if len(chunks) == target:
            break
        s = dataset.get_test_sample(i)
        if len(s.frame_ticks) == 0:
            continue
        chunks.append(next(iter_test_frame_batches(
            provider, s.video_id, s.frame_ticks, s.num_frames, transform,
            new_length=new_length, batch_ticks=1)))
    if not chunks:
        return None
    return np.concatenate(chunks, axis=0)


def load_scaled_stack(provider, video_id: str, tick, frame_cnt: int,
                      scale: GroupScale, new_length: int = 1) -> np.ndarray:
    """Decode + rescale one tick to a stacked uint8 ``(H_s, W_s, c_in)`` array.

    The single shared per-tick recipe of the device-crops inference pipeline
    (PIL bilinear parity with the reference's GroupScale) — used by both
    per-video chunking and cross-video packing so their pixel streams can
    never diverge.
    """
    pil = load_proposal_frames(provider, video_id, [tick], frame_cnt,
                               new_length)
    return Stack()(scale(pil))


def iter_scaled_frame_chunks(provider, video_id: str, frame_ticks: np.ndarray,
                             frame_cnt: int, scale_size: int,
                             new_length: int = 1, batch_ticks: int = 32,
                             executor: Optional[ThreadPoolExecutor] = None
                             ) -> Iterator[np.ndarray]:
    """Yield uint8 arrays ``(n_ticks, H_s, W_s, C_in)`` of scale-size frames.

    The device-crops inference pipeline: host only decodes + rescales (PIL
    bilinear parity); the 10-crop oversample happens on device
    (:func:`..transforms.device_oversample`). Per-tick decode work fans out on
    ``executor`` (JPEG decode is the reference's known 80% of load time,
    transforms.py:286-287 — parallel decode keeps the chip fed) with a bounded
    in-flight window so long videos don't pile decoded frames in host RAM.
    """
    scale = GroupScale(scale_size)

    def load_one(tick) -> np.ndarray:
        return load_scaled_stack(provider, video_id, tick, frame_cnt, scale,
                                 new_length)

    n = len(frame_ticks)
    arrays = iter_windowed_decode(list(frame_ticks), load_one, executor,
                                  window=4 * batch_ticks)
    for lo in range(0, n, batch_ticks):
        yield np.stack([next(arrays) for _ in range(min(batch_ticks, n - lo))])


class PrefetchLoader:
    """Background-thread batch producer with a bounded queue (double buffering).

    At most ``prefetch + num_threads`` batches are in flight: the producer
    blocks on the bounded handoff queue before submitting more work, so slow
    consumers exert real backpressure (no unbounded future pile-up).
    """

    def __init__(self, make_batch: Callable[[int], Dict[str, np.ndarray]],
                 num_batches: int, prefetch: int = 2, num_threads: int = 2):
        self.make_batch = make_batch
        self.num_batches = num_batches
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.pool = ThreadPoolExecutor(max_workers=num_threads)
        self.num_threads = num_threads
        self._producer = threading.Thread(target=self._produce, daemon=True)
        self._started = False

    def _produce(self):
        from collections import deque

        try:
            pending = deque()
            for i in range(self.num_batches):
                pending.append(self.pool.submit(self.make_batch, i))
                # keep only a small window in flight; put() blocks on the
                # bounded queue, throttling submission
                while len(pending) > self.num_threads:
                    self.queue.put(pending.popleft().result())
            while pending:
                self.queue.put(pending.popleft().result())
            self.queue.put(None)
        except BaseException as e:  # propagate to the consumer, never hang it
            self.queue.put(e)

    def __iter__(self):
        if not self._started:
            self._producer.start()
            self._started = True
        while True:
            item = self.queue.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                # a worker batch failed (e.g. missing/corrupt frame file):
                # surface it on the consuming thread instead of hanging the
                # epoch loop (the reference's daemon workers hang, SURVEY §5.3)
                raise item
            yield item
