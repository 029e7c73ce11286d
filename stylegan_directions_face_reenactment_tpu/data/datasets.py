"""VoxCeleb-layout datasets (host side, numpy/NHWC).

Equivalents of `libs/datasets/dataloader.py`, `dataloader_paired.py` and
`dataloader_inversion.py` (reference). Directory layout
(reference README):

    dataset_path/<id>/<video>/frames_cropped/*.png
    dataset_path/<id>/<video>/inversion/frames/*.png
    dataset_path/<id>/<video>/inversion/latent_codes/*.npy

All samples come back as numpy NHWC float32 in [-1, 1] (the reference's
resize(256) → ToTensor → Normalize(.5,.5,.5) chain) ready for device_put.
"""

from __future__ import annotations

import glob
import os
import threading
import queue as queue_mod
from typing import Any, Dict, Iterator, List, Optional

import numpy as np
from PIL import Image


def load_image_gan_range(path: str, size: int = 256) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 127.5 - 1.0


def _list_ids(dataset_path: str) -> List[str]:
    ids = sorted(glob.glob(os.path.join(dataset_path, "*/")))
    if not ids:
        raise FileNotFoundError(
            f"Dataset has no identities in path {dataset_path}")
    return ids


def _video_paths(id_path: str) -> List[str]:
    return sorted(glob.glob(os.path.join(id_path, "*/")))


class CustomDataset:
    """Per-frame {real_img, inv_img, w} samples (`dataloader.py:19-126`)."""

    def __init__(self, dataset_path: str, image_size: int = 256):
        self.dataset_path = dataset_path
        self.image_size = image_size
        real, inv, w = [], [], []
        counter_ids = counter_videos = 0
        for id_path in _list_ids(dataset_path):
            counter_ids += 1
            for video_path in _video_paths(id_path):
                inv_dir = os.path.join(video_path, "inversion")
                if not os.path.exists(inv_dir):
                    raise FileNotFoundError(
                        f"Path with inverted latent codes does not exist: {inv_dir}")
                real += sorted(glob.glob(os.path.join(video_path,
                                                      "frames_cropped", "*.png")))
                inv += sorted(glob.glob(os.path.join(inv_dir, "frames", "*.png")))
                w += sorted(glob.glob(os.path.join(inv_dir, "latent_codes",
                                                   "*.npy")))
                counter_videos += 1
        self.real_images = np.asarray(real)
        self.inv_images = np.asarray(inv)
        self.w = np.asarray(w)
        self.counter_ids = counter_ids
        self.counter_videos = counter_videos

    def get_length(self):
        return len(self.real_images), self.counter_ids, self.counter_videos

    def __len__(self):
        return len(self.real_images)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        code = np.load(self.w[index]).astype(np.float32)
        assert code.ndim == 2, f"latent code should be L x 512, got {code.shape}"
        return {
            "real_img": load_image_gan_range(self.real_images[index],
                                             self.image_size),
            "inv_img": load_image_gan_range(self.inv_images[index],
                                            self.image_size),
            "w": code,
            # frame identity for the Trainer's GT shape-coefficient cache
            "path": str(self.real_images[index]),
        }


class CustomDatasetTestsetSynthetic:
    """Fixed random z pairs for synthetic eval (`dataloader.py:128-174`);
    codes saved to .npy for reproducibility."""

    def __init__(self, synthetic_dataset_path: Optional[str] = None,
                 num_samples: int = 100, save_dir: Optional[str] = None,
                 seed: int = 0):
        self.num_samples = num_samples
        if synthetic_dataset_path is not None:
            z = np.load(synthetic_dataset_path).astype(np.float32)
            self.fixed_source_w = z[:num_samples]
            self.fixed_target_w = z[num_samples:2 * num_samples]
        else:
            rng = np.random.RandomState(seed)
            self.fixed_source_w = rng.randn(num_samples, 512).astype(np.float32)
            self.fixed_target_w = rng.randn(num_samples, 512).astype(np.float32)
            if save_dir is not None:
                os.makedirs(save_dir, exist_ok=True)
                np.save(os.path.join(
                    save_dir, f"random_latent_codes_{2 * num_samples}.npy"),
                    np.concatenate([self.fixed_source_w, self.fixed_target_w]))

    def __len__(self):
        return self.num_samples

    def __getitem__(self, index: int):
        return {"source_w": self.fixed_source_w[index],
                "target_w": self.fixed_target_w[index]}


class CustomDatasetTestsetReal:
    """Real inverted w sources + random z targets (`dataloader.py:176-258`)."""

    def __init__(self, dataset_path: str, num_samples: int = 100,
                 shuffle: bool = True, seed: int = 0):
        self.num_samples = num_samples
        w = []
        counter_ids = counter_videos = 0
        for id_path in _list_ids(dataset_path):
            counter_ids += 1
            for video_path in _video_paths(id_path):
                inv_dir = os.path.join(video_path, "inversion")
                if not os.path.exists(inv_dir):
                    raise FileNotFoundError(
                        f"Path with inverted latent codes does not exist: {inv_dir}")
                w += sorted(glob.glob(os.path.join(inv_dir, "latent_codes",
                                                   "*.npy")))
                counter_videos += 1
        w = np.asarray(w)
        rng = np.random.RandomState(seed)
        if shuffle:
            w = w[rng.permutation(len(w))]
        self.w = w[:num_samples]
        self.num_samples = min(num_samples, len(w))
        self.fixed_target_w = rng.randn(self.num_samples, 512).astype(np.float32)

    def get_length(self):
        return self.num_samples

    def __len__(self):
        return self.num_samples

    def __getitem__(self, index: int):
        code = np.load(self.w[index]).astype(np.float32)
        assert code.ndim == 2
        return {"source_w": code, "target_w": self.fixed_target_w[index]}


class CustomDatasetPaired:
    """Same-video source/target pairs, ``max_pairs`` source frames per
    video, resampled each epoch by rebuilding (`dataloader_paired.py:14-148`,
    `trainer.py:398-404`)."""

    def __init__(self, dataset_path: str, num_samples: Optional[int] = None,
                 max_pairs: int = 2, seed: Optional[int] = None,
                 image_size: int = 256):
        self.dataset_path = dataset_path
        self.max_pairs = max_pairs
        self.image_size = image_size
        self.rng = np.random.RandomState(seed)
        self.resample()

    def resample(self):
        """Re-shuffle frame order per video and re-pick source frames."""
        self.videos: Dict[str, Dict[str, Any]] = {}
        self.samples: List[Any] = []
        counter_ids = counter_videos = 0
        for id_path in _list_ids(self.dataset_path):
            id_index = id_path.rstrip("/").split("/")[-1]
            counter_ids += 1
            for video_path in _video_paths(id_path):
                video_id = video_path.rstrip("/").split("/")[-1]
                frames = sorted(glob.glob(os.path.join(video_path,
                                                       "frames_cropped", "*.png")))
                inv_dir = os.path.join(video_path, "inversion")
                if not os.path.exists(inv_dir):
                    raise FileNotFoundError(
                        f"Path with inverted latent codes does not exist: {inv_dir}")
                codes = sorted(glob.glob(os.path.join(inv_dir, "latent_codes",
                                                      "*.npy")))
                if frames and codes:
                    perm = self.rng.permutation(len(frames))
                    frames = np.asarray(frames)[perm]
                    codes = np.asarray(codes)[perm]
                    key = (id_index, video_id)
                    self.videos[key] = {"frames": frames, "codes": codes,
                                        "num_frames": len(frames)}
                    if len(frames) >= 2:
                        for j in range(min(self.max_pairs, len(frames))):
                            self.samples.append((key, j))
                        counter_videos += 1
        self.counter_ids = counter_ids
        self.counter_videos = counter_videos
        self.num_samples = len(self.samples)

    def get_length(self):
        return self.num_samples, self.counter_ids, self.counter_videos

    def __len__(self):
        return self.num_samples

    def __getitem__(self, index: int):
        key, source_index = self.samples[index]
        video = self.videos[key]
        n = video["num_frames"]
        target_index = source_index
        while target_index == source_index:
            target_index = int(self.rng.randint(n))
        return {
            "source_img": load_image_gan_range(video["frames"][source_index],
                                               self.image_size),
            "source_latent_code": np.load(video["codes"][source_index]).astype(
                np.float32).reshape(-1, 512),
            "target_img": load_image_gan_range(video["frames"][target_index],
                                               self.image_size),
            "target_latent_code": np.load(video["codes"][target_index]).astype(
                np.float32).reshape(-1, 512),
            # frame identities for the Trainer's GT shape-coefficient cache
            "source_path": str(video["frames"][source_index]),
            "target_path": str(video["frames"][target_index]),
        }


class CustomDatasetPairedValidation(CustomDatasetPaired):
    """Fixed target index per sample (`dataloader_paired.py:151-275`)."""

    def __init__(self, dataset_path: str, num_samples: Optional[int] = None,
                 max_pairs: int = 2, seed: int = 0, image_size: int = 256):
        super().__init__(dataset_path, num_samples, max_pairs, seed=seed,
                         image_size=image_size)
        self.fixed_targets = {}
        for i, (key, src) in enumerate(self.samples):
            n = self.videos[key]["num_frames"]
            t = src
            while t == src:
                t = int(self.rng.randint(n))
            self.fixed_targets[i] = t
        if num_samples is not None:
            self.num_samples = min(num_samples, self.num_samples)

    def __getitem__(self, index: int):
        key, source_index = self.samples[index]
        video = self.videos[key]
        target_index = self.fixed_targets[index]
        return {
            "source_img": load_image_gan_range(video["frames"][source_index],
                                               self.image_size),
            "source_latent_code": np.load(video["codes"][source_index]).astype(
                np.float32).reshape(-1, 512),
            "target_img": load_image_gan_range(video["frames"][target_index],
                                               self.image_size),
            "target_latent_code": np.load(video["codes"][target_index]).astype(
                np.float32).reshape(-1, 512),
        }


class DatasetInversion:
    """Frames + routing info for batch e4e inversion
    (`dataloader_inversion.py:10-123`)."""

    def __init__(self, dataset_path: str, image_size: int = 256):
        self.image_size = image_size
        self.entries: List[Dict[str, str]] = []
        for id_path in _list_ids(dataset_path):
            id_index = id_path.rstrip("/").split("/")[-1]
            for video_path in _video_paths(id_path):
                video_id = video_path.rstrip("/").split("/")[-1]
                for f in sorted(glob.glob(os.path.join(video_path,
                                                       "frames_cropped", "*.png"))):
                    self.entries.append({
                        "path": f,
                        "id_index": id_index,
                        "video_index": video_id,
                        "filename": os.path.splitext(os.path.basename(f))[0],
                    })

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, index: int):
        e = self.entries[index]
        return {"image": load_image_gan_range(e["path"], self.image_size), **e}


class Loader:
    """Minimal host-side batch loader with a background prefetch thread
    (the reference uses torch DataLoader(num_workers=1),
    `trainer.py:225-229`)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def _collate(self, samples):
        out: Dict[str, Any] = {}
        for k in samples[0]:
            vals = [s[k] for s in samples]
            if isinstance(vals[0], np.ndarray):
                out[k] = np.stack(vals)
            else:
                out[k] = vals
        return out

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            for batch_idx in self._index_batches():
                q.put(self._collate([self.dataset[int(i)] for i in batch_idx]))
            q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
