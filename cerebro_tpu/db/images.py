"""Tiered RAM <-> disk image store.

Functional equivalent of the reference's ImageDataManager
(src/ImageDataManager.{h,cpp}): images keyed by (namespace, global index),
kept in RAM for the recent window, stashed to disk for old keyframes and
reloaded on demand with a hit-count cache (ref states AVAILABLE_ON_RAM /
ON_DISK / UNAVAILABLE / ON_RAM_DUETO_HIT, src/ImageDataManager.h:41;
reload TTL 10 hits, src/ImageDataManager.cpp:155).

Differences by design: compressed .npz instead of JPG (no OpenCV
dependency; lossless), and a single-writer access pattern (the ingest loop)
instead of mutex-guarded multi-thread access — the known deadlock landmine
at ref src/ImageDataManager.cpp:445 does not exist here.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, Optional, Tuple

import numpy as np

AVAILABLE_ON_RAM = "ram"
ON_DISK = "disk"
ON_RAM_DUETO_HIT = "ram_hit"
UNAVAILABLE = "unavailable"


class ImageStore:
    def __init__(self, stash_dir: str = "/tmp/cerebro_tpu_stash", cache_ttl: int = 10):
        self.stash_dir = stash_dir
        self.cache_ttl = cache_ttl
        self._ram: Dict[Tuple[str, int], np.ndarray] = {}
        self._state: Dict[Tuple[str, int], str] = {}
        self._hits: Dict[Tuple[str, int], int] = {}
        os.makedirs(stash_dir, exist_ok=True)

    def _path(self, ns: str, idx: int) -> str:
        return os.path.join(self.stash_dir, f"{ns}__{idx}.npz")

    # -- writes ---------------------------------------------------------

    def put(self, ns: str, idx: int, img: np.ndarray):
        """New image arrives (ref setNewImageFromMsg)."""
        self._ram[(ns, idx)] = img
        self._state[(ns, idx)] = AVAILABLE_ON_RAM

    def stash(self, ns: str, idx: int):
        """RAM -> disk (ref stashImage: keyframes leaving the RAM window)."""
        key = (ns, idx)
        if self._state.get(key) in (AVAILABLE_ON_RAM, ON_RAM_DUETO_HIT):
            np.savez_compressed(self._path(ns, idx), img=self._ram[key])
            del self._ram[key]
            self._hits.pop(key, None)
            self._state[key] = ON_DISK

    def remove(self, ns: str, idx: int):
        """Drop entirely (ref rmImage: non-keyframes)."""
        key = (ns, idx)
        self._ram.pop(key, None)
        self._hits.pop(key, None)
        if self._state.get(key) == ON_DISK:
            try:
                os.remove(self._path(ns, idx))
            except FileNotFoundError:
                pass
        self._state[key] = UNAVAILABLE

    # -- reads ----------------------------------------------------------

    def get(self, ns: str, idx: int) -> Optional[np.ndarray]:
        """Fetch; disk reloads are cached with a TTL decremented per access
        (ref getImage hit-count 10, src/ImageDataManager.cpp:113-189)."""
        key = (ns, idx)
        state = self._state.get(key, UNAVAILABLE)
        if state in (AVAILABLE_ON_RAM, ON_RAM_DUETO_HIT):
            if state == ON_RAM_DUETO_HIT:
                self._hits[key] -= 1
                if self._hits[key] <= 0:
                    img = self._ram.pop(key)
                    self._state[key] = ON_DISK
                    return img
            return self._ram[key]
        if state == ON_DISK:
            img = np.load(self._path(ns, idx))["img"]
            self._ram[key] = img
            self._state[key] = ON_RAM_DUETO_HIT
            self._hits[key] = self.cache_ttl
            return img
        return None

    def state_of(self, ns: str, idx: int) -> str:
        return self._state.get((ns, idx), UNAVAILABLE)

    def ram_keys(self):
        """Snapshot of (namespace, index) pairs currently RAM-resident."""
        return list(self._ram.keys())

    # -- checkpoint ------------------------------------------------------

    def stash_all(self):
        """Flush everything to disk (ref stashAll, checkpoint path)."""
        for key in list(self._ram.keys()):
            self.stash(*key)

    def save_to(self, directory: str):
        """Persist the whole stash for teach-and-repeat (ref: mv
        /tmp/cerebro_stash -> save dir, src/DataManager.cpp:1199-1205)."""
        self.stash_all()
        os.makedirs(directory, exist_ok=True)
        for f in os.listdir(self.stash_dir):
            shutil.copy2(os.path.join(self.stash_dir, f), os.path.join(directory, f))

    @classmethod
    def load_from(
        cls, directory: str, stash_dir: str = "/tmp/cerebro_tpu_stash", cache_ttl: int = 10
    ) -> "ImageStore":
        store = cls(stash_dir=stash_dir, cache_ttl=cache_ttl)
        for f in os.listdir(directory):
            if not f.endswith(".npz"):
                continue
            shutil.copy2(os.path.join(directory, f), os.path.join(stash_dir, f))
            ns, idx = f[: -len(".npz")].rsplit("__", 1)
            store._state[(ns, int(idx))] = ON_DISK
        return store
