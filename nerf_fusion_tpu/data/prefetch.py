"""Read-ahead frame decoding for disk-backed sequences.

The online-fusion hot loop otherwise blocks 5-15 ms/frame on serial PNG
decode (the reference hides the equivalent cost behind DataLoader workers
on the training side only; its fusion loop decodes inline --
/root/reference/dataset/production/icl_nuim.py:102-123).  cv2/libpng release
the GIL, so a small thread pool overlaps decode with device compute.

Two modes:
- Sequences exposing ``load_frame(idx)`` (random access, thread-safe) decode
  up to ``depth`` frames ahead across ``workers`` threads.
- Iterator-only sequences fall back to a single worker issuing ``next(base)``
  calls in order, still overlapping decode with the consumer.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor

from .base import FrameData

_END = object()  # sentinel: base iterator exhausted (fallback mode)


class PrefetchSequence:
    """Wraps an RGBDSequence; iteration order and frame contents are
    identical to direct iteration (tests/test_prefetch.py)."""

    def __init__(self, base, depth: int = 4, workers: int = 2,
                 upload: bool = False):
        """``upload``: also ``jax.device_put`` rgb/depth inside the worker
        thread, overlapping the host->device copy with the frame loop's
        device compute.  On a PCIe host this hides ~1 ms/frame; through a
        tunneled device (1-50 MB/s) it hides the 30-100 ms/frame transfer
        that otherwise serialises with dispatch.  Consumers pass device
        arrays straight into the jitted frontend (jnp.asarray is a no-op)."""
        if depth < 1:
            raise ValueError("prefetch depth must be >= 1")
        self._base = base
        self._depth = depth
        self._upload = upload
        self._random_access = hasattr(base, "load_frame")
        # Iterator-only sequences advance internal state in __next__; a
        # single worker keeps those calls ordered.
        self._pool = ThreadPoolExecutor(
            max_workers=workers if self._random_access else 1,
            thread_name_prefix="prefetch")
        self._pending = deque()
        self._next_submit = 0
        self._fill()

    # -- passthrough ------------------------------------------------------
    def __len__(self):
        return len(self._base)

    def __getattr__(self, name):
        # gt_trajectory, calib, first_tq, ... resolve on the wrapped reader.
        return getattr(self._base, name)

    # -- iteration --------------------------------------------------------
    def __iter__(self):
        return self

    def _maybe_upload(self, frame):
        if self._upload and frame is not _END and frame is not None:
            import jax
            # async H2D: device_put returns immediately; the copy overlaps
            # the consumer's compute while this frame waits in the queue
            frame.rgb = jax.device_put(frame.rgb)
            frame.depth = jax.device_put(frame.depth)
        return frame

    def _load_at(self, idx):
        return self._maybe_upload(self._base.load_frame(idx))

    def _fetch_next_inorder(self):
        try:
            return self._maybe_upload(next(self._base))
        except StopIteration:
            return _END

    def _fill(self):
        while len(self._pending) < self._depth:
            if self._random_access:
                if self._next_submit >= len(self._base):
                    break
                fut = self._pool.submit(self._load_at, self._next_submit)
            else:
                fut = self._pool.submit(self._fetch_next_inorder)
            self._next_submit += 1
            self._pending.append(fut)

    def __next__(self) -> FrameData:
        if not self._pending:
            raise StopIteration
        frame = self._pending.popleft().result()
        self._fill()
        if frame is _END:
            raise StopIteration
        return frame

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
