"""Multimodal (binary-column) plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
decode / feature-extract stages are actor-pool ``map_batches`` stages. The
actual codec libraries are NOT available in this environment, so the decode
kernel is stubbed: ``DecodeStage(real=True)`` raises ``NotImplementedError``
at the exact point a real decoder would run, while the default deterministic
fake derives metadata from the payload bytes — the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
    ]
)


def attach_fake_payload(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Turn a documents batch into a media batch (payload = utf-8 bytes of the
    text — a deterministic stand-in for real image/audio bytes)."""
    payloads = [(t or "").encode("utf-8") for t in batch[text_col].to_pylist()]
    # derive from doc_id, not batch position — block splits must not change it
    types = ["image" if d % 2 == 0 else "audio" for d in batch["doc_id"].to_pylist()]
    return pa.table(
        {
            "media_id": batch["doc_id"],
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStage:
    """Actor-pool decode stage. Small batches on purpose: binary payloads are
    wide rows, and batch_size × concurrency must fit the worker heap
    (use e.g. ``map_batches(DecodeStage, batch_size=64, concurrency=4)``)."""

    def __init__(self, real: bool = False):
        self.real = real  # flips to the real decoder when codecs exist

    def _decode_real(self, payload: bytes, media_type: str):
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present in "
            "this environment; wire Pillow/torchaudio here"
        )

    def _decode_fake(self, payload: bytes, media_type: str):
        """Deterministic fake: metadata derived from a payload digest."""
        h = hashlib.blake2b(payload, digest_size=8).digest()
        a, b = int.from_bytes(h[:4], "big"), int.from_bytes(h[4:], "big")
        if media_type == "image":
            return {"width": 64 + a % 1920, "height": 64 + b % 1080, "frames": 1}
        return {"width": 0, "height": 0, "frames": 1 + a % 48000}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, types, nbytes, widths, heights, frames = [], [], [], [], [], []
        for mid, mt, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            meta = (self._decode_real if self.real else self._decode_fake)(payload, mt)
            ids.append(mid)
            types.append(mt)
            nbytes.append(len(payload))
            widths.append(meta["width"])
            heights.append(meta["height"])
            frames.append(meta["frames"])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "frames": pa.array(frames, pa.int64()),
            }
        )


def decode_media(ds, *, batch_size: int = 64, concurrency=(1, 4), real: bool = False):
    return ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"real": real},
    )


class ResizeStage:
    """Actor-pool image-resize stage: same stub discipline as DecodeStage
    (``real=True`` raises where Pillow would run; the fake re-digests the
    payload so output bytes are deterministic and size-bounded)."""

    def __init__(self, width: int = 224, height: int = 224, real: bool = False):
        self.width, self.height, self.real = width, height, real

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["payload"].to_pylist():
            if self.real:
                raise NotImplementedError(
                    "real resize requires an image library not present here; "
                    "wire Pillow Image.resize into this branch"
                )
            h = hashlib.blake2b(payload, digest_size=32, person=b"resize").digest()
            out.append(h)  # fixed-size stand-in for the resized image bytes
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array([self.width] * len(batch), pa.int64()),
                "height": pa.array([self.height] * len(batch), pa.int64()),
            }
        )


def resize_media(ds, *, width: int = 224, height: int = 224, batch_size: int = 64,
                 concurrency=(1, 4), real: bool = False):
    return ds.map_batches(
        ResizeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"width": width, "height": height, "real": real},
    )


def frame_sample(decoded, *, every_n: int = 10):
    """Flat-map decoded media metadata to sampled frame rows
    (media_id, frame_idx) — one input row expands to ceil(frames/every_n)
    rows. Deterministic; the shape of a video frame-sampling stage."""

    def sample(batch: pa.Table) -> pa.Table:
        ids, idxs = [], []
        for mid, frames in zip(
            batch["media_id"].to_pylist(), batch["frames"].to_pylist()
        ):
            for f in range(0, int(frames), every_n):
                ids.append(mid)
                idxs.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
            }
        )

    return decoded.map_batches(sample, batch_format="pyarrow", batch_size=256)
