"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as actor-pool ``map_batches`` stages.

The container ships no image/audio codecs, so the *decode kernel* is gated:
``DecodeStage(kernel="real")`` raises ``NotImplementedError`` with the
intended dependency, while ``kernel="fake"`` runs a deterministic byte-level
"decode" (header parse + byte statistics) so the Ray-side plumbing — binary
Arrow columns, actor signature, small batch sizes for wide rows, output
layout — is real and tested end-to-end.

Schema convention for a media table::

    media_id: int64, kind: string ('image'|'audio'|...), payload: binary,
    meta_width/meta_height (images) or meta_sample_rate (audio): int32

Large payloads → keep ``batch_size`` small (wide binary rows) and
``batch_format="pyarrow"`` (binary round-trips zero-copy through Arrow but
becomes object dtype in pandas)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def synth_media_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Deterministic fake media derived from the documents table: payload =
    utf-8 bytes of text behind a tiny header. Stands in for real image/audio
    bytes in tests and oracle checks."""
    ids = batch[id_col].to_numpy()
    payloads = []
    for i, t in zip(ids, batch[text_col].to_pylist()):
        body = (t or "").encode("utf-8")
        header = b"FAKE" + int(i).to_bytes(8, "little") + len(body).to_bytes(4, "little")
        payloads.append(header + body)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class DecodeStage:
    """Actor-pool decode/feature stage.

    kernel="auto" (try-import, VERDICT r02 item 8): the real PIL kernel
    when Pillow is importable, else the fake kernel.
    kernel="real": decodes the payload with PIL (n_bytes of the payload,
    first payload byte, mean grayscale pixel) — raises NotImplementedError
    when Pillow is absent (fail fast, per-actor __init__).
    kernel="fake": deterministic byte-level features (n_bytes of the body,
    first body byte, mean body byte) — exercises schema, actor lifecycle
    and output layout without codecs; the oracle-checked entries pin this
    kernel explicitly so their results never depend on the environment."""

    HEADER = 16  # b"FAKE" + id u64 + body_len u32

    def __init__(self, kernel: str = "fake"):
        if kernel == "auto":
            kernel = "real" if _try_pil() else "fake"
        if kernel == "real":
            self._pil = _try_pil()
            if self._pil is None:
                raise NotImplementedError(
                    "real media decode needs PIL (pip install pillow) — "
                    "use kernel='fake' (or 'auto') for plumbing tests"
                )
        elif kernel != "fake":
            raise ValueError(f"unknown kernel {kernel!r}")
        self.kernel = kernel

    def _real_features(self, payloads):
        import io

        n_bytes, first, mean = [], [], []
        for p in payloads:
            n_bytes.append(len(p))
            first.append(p[0] if p else 0)
            img = self._pil.open(io.BytesIO(p)).convert("L")
            mean.append(round(float(np.asarray(img).mean()), 6))
        return n_bytes, first, mean

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.kernel == "real":
            n_bytes, first, mean = self._real_features(payloads)
        else:
            n_bytes, first, mean = [], [], []
            for p in payloads:
                body = p[self.HEADER :]
                n_bytes.append(len(body))
                first.append(body[0] if body else 0)
                arr = np.frombuffer(body, np.uint8)
                mean.append(round(float(arr.mean()), 6) if len(arr) else 0.0)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "first_byte": pa.array(first, pa.int64()),
                "mean_byte": pa.array(mean, pa.float64()),
            }
        )


def media_features(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    """documents -> fake media payloads -> actor-pool decode -> features.
    Small batch_size: media rows are wide."""
    media = ds.map_batches(
        lambda b: synth_media_batch(b, id_col, text_col), batch_format="pyarrow"
    )
    return media.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"kernel": "fake"},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


class ResizeStage:
    """Actor-pool image-resize stage (auto/real/fake like DecodeStage): the
    real kernel is PIL ``Image.resize`` (PNG bytes out); the fake kernel
    deterministically subsamples the body to ``target_w × target_h`` bytes
    so the binary-out plumbing (payload in → smaller payload out, meta
    columns updated) is real and testable without codecs."""

    HEADER = DecodeStage.HEADER

    def __init__(self, target_w: int = 8, target_h: int = 8, kernel: str = "fake"):
        if kernel == "auto":
            kernel = "real" if _try_pil() else "fake"
        if kernel == "real":
            self._pil = _try_pil()
            if self._pil is None:
                raise NotImplementedError(
                    "real image resize needs PIL (pip install pillow) — use "
                    "kernel='fake' (or 'auto') for plumbing tests"
                )
        elif kernel != "fake":
            raise ValueError(f"unknown kernel {kernel!r}")
        self.kernel = kernel
        self.target = target_w * target_h
        self.target_w, self.target_h = target_w, target_h

    def _real_resize(self, p: bytes) -> bytes:
        import io

        img = self._pil.open(io.BytesIO(p)).resize((self.target_w, self.target_h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for p in batch["payload"].to_pylist():
            if self.kernel == "real":
                payloads.append(self._real_resize(p))
                continue
            header, body = p[: self.HEADER], p[self.HEADER :]
            if len(body) > self.target:
                step = len(body) // self.target
                body = bytes(np.frombuffer(body, np.uint8)[:: step][: self.target])
            payloads.append(header + body)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(payloads, pa.binary()),
                "meta_width": pa.array(
                    np.full(batch.num_rows, self.target_w, np.int32)
                ),
                "meta_height": pa.array(
                    np.full(batch.num_rows, self.target_h, np.int32)
                ),
            }
        )


class FrameSampleStage:
    """Actor-pool video frame sampler (gated): the real kernel would be
    PyAV; the fake kernel treats the payload body as a sequence of
    ``frame_size``-byte frames and emits every ``every``-th frame as its OWN
    row — the one-row-to-many-rows expansion shape a real frame sampler
    needs (flat output, frame index column, per-frame payload)."""

    HEADER = DecodeStage.HEADER

    def __init__(self, frame_size: int = 64, every: int = 4, kernel: str = "fake"):
        if kernel == "real":
            raise NotImplementedError(
                "real frame sampling needs PyAV — not shipped in this "
                "container; use kernel='fake' for plumbing tests"
            )
        if kernel != "fake":
            raise ValueError(f"unknown kernel {kernel!r}")
        self.frame_size = frame_size
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            body = p[self.HEADER :]
            n_frames = (len(body) + self.frame_size - 1) // self.frame_size
            for i in range(0, n_frames, self.every):
                ids.append(mid)
                fidx.append(i)
                frames.append(body[i * self.frame_size : (i + 1) * self.frame_size])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def frame_sample_counts(
    ds: ray.data.Dataset, frame_size: int = 64, every: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    """documents -> fake media -> frame sampler -> sampled-frame count per
    media id (the oracle-checkable reduction of the frame stream)."""
    from ray.data.aggregate import Count

    media = ds.map_batches(
        lambda b: synth_media_batch(b, id_col, text_col), batch_format="pyarrow"
    )
    frames = media.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"frame_size": frame_size, "every": every},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )
    return frames.groupby("media_id").aggregate(Count(alias_name="n_frames"))
