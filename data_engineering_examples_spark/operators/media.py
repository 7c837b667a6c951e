"""Multimodal column operators (builder brief "Multimodal columns").

Media is carried as an opaque ``binary`` payload column + typed metadata
columns — the only schema that survives 100 TB: Spark never interprets
the bytes except inside explicitly Arrow-batched Python stages, and
everything else (filters on kind/format/dimensions, joins to caption
text, size accounting) is pure columnar work that prunes and pushes down.

The decode boundary is honest about this container: real image/audio
decoding libraries are NOT installed, so

* ``decode_image``/``resize_image`` raise ``NotImplementedError`` unless
  a decoder is injected — the CLEARLY-MARKED stub the brief asks for;
* ``extract_features`` runs a real ``mapInPandas`` pipeline with a
  deterministic byte-histogram featurizer standing in for a model
  embedding — the Arrow batch shape, schema handling, and partitioning
  are exactly what a real encoder stage uses (swap ``_byte_histogram``
  for the model call);
* ``sample_frames`` emulates video frame sampling by slicing k
  evenly-spaced windows out of the payload — one row in, k rows out,
  the fan-out shape of a real frame extractor.

Scale notes: feature extraction is map-only (scales with executors; no
shuffle), and payload bytes never cross a shuffle boundary — downstream
joins/aggregations use the slim (media_id, features/meta) projections.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 16

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes int, features array<double>"
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_bytes binary"


def decode_image(payload: bytes, decoder: Callable[[bytes], object] | None = None):
    """STUB: real decode needs an image library not present in this
    environment. Inject ``decoder`` (e.g. PIL.Image.open wrapped) in a
    real deployment."""
    if decoder is None:
        raise NotImplementedError(
            "image decode requires an injected decoder; none is available "
            "in this environment (no PIL/opencv)"
        )
    return decoder(payload)


def resize_image(payload: bytes, width: int, height: int, resizer=None):
    """STUB, same contract as decode_image."""
    if resizer is None:
        raise NotImplementedError("image resize requires an injected resizer")
    return resizer(payload, width, height)


def _byte_histogram(payload: bytes) -> list[float]:
    """Deterministic stand-in featurizer: 16-bucket byte histogram,
    L1-normalized. Replace with the model encoder in production."""
    counts = [0] * N_FEATURES
    if not payload:
        return [0.0] * N_FEATURES
    for b in payload:
        counts[b >> 4] += 1
    n = float(len(payload))
    return [c / n for c in counts]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column
    (``mapInPandas``): the real plumbing for a model-encoder stage."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(_byte_histogram),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Evenly-spaced frame sampling over video payloads (1 row → k rows).
    The byte-slice stands in for a real frame decode; offsets are the
    deterministic part a real extractor shares."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload)
                if n == 0:
                    continue
                step = max(1, n // n_frames)
                for i in range(n_frames):
                    off = min(i * step, max(0, n - 1))
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(payload[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(sample, schema=FRAME_SCHEMA)
    )
