"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal tables: media lives as an opaque ``binary``
column next to typed metadata (mime, width/height, duration), processed by
Arrow-batched ``mapInPandas`` stages.  The Spark-side plumbing here (schema,
batch iteration, partition sizing) is real and tested; the *codec* step is
STUBBED because no image/audio libraries exist in this container:

* decode_image / decode_audio raise NotImplementedError unless
  ``fake=True``, which substitutes a deterministic fake decoder so the
  downstream plumbing (resize, frame-sample) is exercisable in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

IMAGE_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"GIF8": "image/gif",
}


def sniff_mime(payload: bytes) -> str:
    for magic, mime in IMAGE_MAGIC.items():
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload to (height, width, channels) + pixel summary.

    STUB: real decoding needs an imaging library not present in this
    container.  ``fake=True`` returns a deterministic pseudo-decode derived
    from the bytes so batch plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (not in container); "
            "pass fake=True for the deterministic test decoder"
        )
    n = len(payload)
    h = (n % 480) + 1
    w = (n % 640) + 1
    checksum = sum(payload[:256]) % 65536
    return {"height": h, "width": w, "channels": 3, "pix_checksum": checksum}


def decode_audio(payload: bytes, fake: bool = False):
    """STUB audio decode -> (n_samples, sample_rate)."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library (not in container); "
            "pass fake=True for the deterministic test decoder"
        )
    return {"n_samples": len(payload) // 2, "sample_rate": 16000}


def frame_sample_indices(n_frames: int, k: int) -> list[int]:
    """Deterministic uniform frame sampling (video path)."""
    if n_frames <= 0 or k <= 0:
        return []
    if k >= n_frames:
        return list(range(n_frames))
    return [(i * n_frames) // k for i in range(k)]


def image_meta_stage(df: DataFrame, payload_col: str = "payload",
                     fake: bool = True) -> DataFrame:
    """mapInPandas stage: binary payloads -> typed image metadata rows.

    Real Spark plumbing (Arrow batches, explicit output schema); the decode
    inside is the stub above.
    """
    import pandas as pd

    other = [c for c in df.columns if c != payload_col]

    def run(batches):
        for pdf in batches:
            pays = pdf[payload_col]
            metas = [decode_image(bytes(p), fake=fake) for p in pays]
            out = {c: pdf[c] for c in other}
            out["mime"] = [sniff_mime(bytes(p)) for p in pays]
            out["height"] = pd.array([m["height"] for m in metas], dtype="int32")
            out["width"] = pd.array([m["width"] for m in metas], dtype="int32")
            out["pix_checksum"] = pd.array([m["pix_checksum"] for m in metas], dtype="int32")
            yield pd.DataFrame(out)

    schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in other]
        + ["mime string", "height int", "width int", "pix_checksum int"]
    )
    return df.mapInPandas(run, schema)
