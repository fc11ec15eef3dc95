"""Image-based explicit loop detection extension.

Role model: glim_ext's dbow_loop_detector (visual place recognition feeding
explicit loop candidates into the global mapping, reference
docs/extensions.md "DBoW loop detector"). DBoW3 quantizes sparse ORB
features into a bag-of-words vocabulary — a scalar-heavy, branchy CPU
pipeline. The TPU-native redesign uses a DENSE global descriptor instead:
a HOG-style grid of gradient-orientation histograms computed by one jitted
program (reductions + elementwise, static shapes), and place matching is a
single (N, D) @ (D,) cosine-similarity matmul against the whole descriptor
database — MXU work that scales to thousands of keyframes at microseconds
per query.

Wiring: ``GlobalMappingCallbacks.on_insert_image`` buffers recent camera
frames; ``on_insert_submap`` pairs each new submap with the image closest
to its middle-frame stamp, queries the database (temporal exclusion +
similarity threshold + second-best ratio test), and fires
``request_to_add_loop(tgt, src)`` — serviced by AsyncGlobalMapping for both
backends, which validate candidates geometrically before adding factors
(so a visual false positive cannot corrupt the graph by itself).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks as GCB
from glim_tpu.utils.extension_module import ExtensionModule
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("img_loop")

_SIZE = 64          # descriptor input resolution (square)
_CELLS = 8          # cells per side
_BINS = 8           # orientation bins
DESC_DIM = _CELLS * _CELLS * _BINS


def _to_gray64(image: np.ndarray) -> np.ndarray:
    """Host-side: any (H, W[, C]) uint8/float image -> (64, 64) float32 by
    channel mean + box downsample (cheap numpy; the heavy math is jitted)."""
    img = np.asarray(image)
    if img.ndim == 3:
        img = img.mean(axis=2)
    img = img.astype(np.float32)

    # Full-field strided resample: floor-cropping would discard up to half
    # the field of view at common small resolutions (e.g. 120x160), making
    # descriptors viewpoint-fragile.
    def resample_axis(a, n, axis):
        size = a.shape[axis]
        if size <= n:   # nearest upsample
            idx = np.minimum((np.arange(n) * size) // n, size - 1)
            return np.take(a, idx, axis=axis)
        # Variable-size block average over bin edges spanning the full axis.
        edges = (np.arange(n + 1) * size) // n
        csum = np.cumsum(a, axis=axis)
        csum = np.concatenate([np.zeros_like(np.take(csum, [0], axis=axis)),
                               csum], axis=axis)
        hi = np.take(csum, edges[1:], axis=axis)
        lo = np.take(csum, edges[:-1], axis=axis)
        cnt = (edges[1:] - edges[:-1]).astype(np.float32)
        shape = [1, 1]
        shape[axis] = n
        return (hi - lo) / cnt.reshape(shape)

    return resample_axis(resample_axis(img, _SIZE, 0), _SIZE, 1)


@jax.jit
def image_descriptor(gray: jnp.ndarray) -> jnp.ndarray:
    """(64, 64) grayscale -> (DESC_DIM,) L2-normalized HOG-grid descriptor.

    Central-difference gradients, soft-assigned orientation histograms per
    8x8 cell, per-cell L2 block normalization (illumination invariance),
    global L2 normalization (so database similarity is one dot product)."""
    g = gray / (jnp.max(gray) + 1e-6)
    gx = jnp.zeros_like(g).at[:, 1:-1].set((g[:, 2:] - g[:, :-2]) * 0.5)
    gy = jnp.zeros_like(g).at[1:-1, :].set((g[2:, :] - g[:-2, :]) * 0.5)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)                      # [-pi, pi)
    binf = (ang + jnp.pi) / (2 * jnp.pi) * _BINS   # [0, BINS)
    b0 = jnp.floor(binf).astype(jnp.int32) % _BINS
    w1 = binf - jnp.floor(binf)
    cs = _SIZE // _CELLS
    # (CELLS, cs, CELLS, cs) cell view; histogram via one-hot soft binning.
    def cellize(x):
        return x.reshape(_CELLS, cs, _CELLS, cs).transpose(0, 2, 1, 3) \
                .reshape(_CELLS, _CELLS, cs * cs)
    m_c, b_c, w_c = cellize(mag), cellize(b0), cellize(w1)
    oh0 = jax.nn.one_hot(b_c, _BINS) * (m_c * (1 - w_c))[..., None]
    oh1 = jax.nn.one_hot((b_c + 1) % _BINS, _BINS) * (m_c * w_c)[..., None]
    hist = jnp.sum(oh0 + oh1, axis=2)              # (CELLS, CELLS, BINS)
    hist = hist / (jnp.linalg.norm(hist, axis=-1, keepdims=True) + 1e-6)
    desc = hist.reshape(-1)
    return desc / (jnp.linalg.norm(desc) + 1e-9)


@jax.jit
def database_query(db: jnp.ndarray, q: jnp.ndarray):
    """(N, D) database x (D,) query -> (similarities, argmax). One matmul."""
    sims = db @ q
    return sims, jnp.argmax(sims)


class ImageLoopDetector(ExtensionModule):
    """Visual place-recognition loop detector over submaps (glim_ext's
    dbow_loop_detector role)."""

    def __init__(self, similarity_threshold: float = 0.88,
                 ratio_threshold: float = 1.03,
                 exclude_recent: int = 3, image_buffer: int = 64):
        self.similarity_threshold = similarity_threshold
        # best/second-best margin: genuine revisits beat the best wrong
        # place by a clear gap; perceptual aliasing does not.
        self.ratio_threshold = ratio_threshold
        self.exclude_recent = exclude_recent
        self.image_buffer = image_buffer
        self._images: List[Tuple[float, np.ndarray]] = []   # (stamp, gray64)
        import threading
        self._images_lock = threading.Lock()
        self.descriptors: List[np.ndarray] = []
        self.submap_ids: List[int] = []
        self.matches: List[tuple] = []                       # (tgt, src, sim)
        self._db: Optional[jnp.ndarray] = None               # padded stack
        self._h_img = GCB.on_insert_image.add(self._on_image)
        self._h_sub = GCB.on_insert_submap.add(self._on_new_submap)

    def detach(self) -> None:
        if self._h_img is not None:
            GCB.on_insert_image.remove(self._h_img)
            GCB.on_insert_submap.remove(self._h_sub)
            self._h_img = self._h_sub = None

    # -- image stream --

    def _on_image(self, stamp: float, image) -> None:
        if hasattr(image, "to_array"):   # undecoded ImageMsg
            image = image.to_array()
        try:
            gray = _to_gray64(image)
        except Exception as e:
            logger.warning("image conversion failed (%s %s): %s",
                           type(image).__name__,
                           getattr(image, "shape", "?"), e)
            return
        # on_insert_image may fire on the caller thread while _image_for
        # runs on the mapping worker; guard the buffer (the reference
        # instead queues images to the worker, async_global_mapping.cpp:33).
        with self._images_lock:
            self._images.append((float(stamp), gray))
            if len(self._images) > self.image_buffer:
                self._images.pop(0)

    def _image_for(self, stamp: float) -> Optional[np.ndarray]:
        with self._images_lock:
            images = list(self._images)
        if not images:
            return None
        i = int(np.argmin([abs(s - stamp) for s, _ in images]))
        s, gray = images[i]
        return gray if abs(s - stamp) < 5.0 else None

    # -- detection --

    def _submap_stamp(self, submap) -> Optional[float]:
        if submap.frames:
            return float(submap.frames[len(submap.frames) // 2].stamp)
        return None

    def _on_new_submap(self, submap) -> None:
        stamp = self._submap_stamp(submap)
        gray = self._image_for(stamp) if stamp is not None else None
        if gray is None:
            return
        desc = np.asarray(image_descriptor(jnp.asarray(gray)))
        cur = len(self.descriptors)
        self.descriptors.append(desc)
        self.submap_ids.append(int(submap.id))

        n_hist = cur - self.exclude_recent
        if n_hist <= 0:
            return
        # Padded database stack: power-of-two rows so XLA compiles one
        # program per capacity doubling, not one per insert.
        cap = 1 << max(3, int(np.ceil(np.log2(n_hist))))
        db = np.zeros((cap, DESC_DIM), np.float32)
        db[:n_hist] = np.stack(self.descriptors[:n_hist])
        sims, best = database_query(jnp.asarray(db), jnp.asarray(desc))
        sims = np.asarray(sims)[:n_hist]
        best = int(np.argmax(sims))
        if sims[best] < self.similarity_threshold:
            return
        second = float(np.partition(sims, -2)[-2]) if n_hist > 1 else 0.0
        if second > 1e-6 and sims[best] / second < self.ratio_threshold:
            return
        logger.info("image loop %d -> %d (sim %.3f)",
                    self.submap_ids[best], self.submap_ids[cur],
                    float(sims[best]))
        self.matches.append((best, cur, float(sims[best])))
        GCB.request_to_add_loop(self.submap_ids[best], self.submap_ids[cur])


@register_module("extension", "image_loop")
def create_extension_module(*args, **kwargs):
    from glim_tpu.utils.config import GlobalConfig
    kw = {}
    try:
        cfg = GlobalConfig.instance()
        g = lambda k, d: cfg.param("image_loop", k, d)  # noqa: E731
        kw = dict(
            similarity_threshold=float(g("similarity_threshold", 0.88)),
            ratio_threshold=float(g("ratio_threshold", 1.03)),
            exclude_recent=int(g("exclude_recent", 3)),
            image_buffer=int(g("image_buffer", 64)))
    except Exception:
        pass
    return ImageLoopDetector(**kw)
