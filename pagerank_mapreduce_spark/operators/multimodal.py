"""Multimodal columns: image/audio/video as opaque binary + metadata.

The design a 100 TB training-data pipeline needs: media payloads are
``BinaryType`` columns with typed metadata alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip row-at-a-time.

The decode kernels themselves are STUBBED — the image/audio libs are
not in this container — behind ``decoder=`` injection points with a
deterministic fake used by default and in tests. Everything
Spark-side is real and tested: schema, batch shape, partition sizing,
UDF signatures.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "n_bytes bigint"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, feature array<float>, "
    "decode_ok boolean"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat each document's utf-8 bytes as an opaque
    payload so the binary-column pipeline is exercised on real data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an image/audio decoder: derives a
    fixed-width feature vector from a digest of the bytes. Replace via
    ``decoder=`` with e.g. a PIL/torchvision kernel in production."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


_HAS_PIL = _pil_available()


def _pil_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Real image decode kernel, auto-selected when Pillow is
    importable: grayscale, resize to (dim, dim), emit per-row pixel
    means scaled to [0, 1]. Imported lazily so the module loads in
    containers without the lib."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, dim))
    data = list(img.getdata())
    return [
        sum(data[r * dim : (r + 1) * dim]) / dim / 255.0 for r in range(dim)
    ]


def _resolve_decoder(
    decoder: Callable[[bytes], list[float]] | str | None,
) -> Callable[[bytes], list[float]]:
    """``"auto"`` (the default) picks the real PIL kernel when the lib
    is importable and the deterministic fake otherwise — the operator
    becomes real the day the container gains the dependency, with no
    caller change. ``"fake"`` / ``"pil"`` pin a kernel explicitly (the
    catalog's oracle-replayed queries pin ``"fake"``); a callable is
    used as-is."""
    if callable(decoder):
        return decoder
    if decoder == "fake":
        return _fake_decode
    if decoder == "pil":
        if not _HAS_PIL:
            raise ImportError(
                "decoder='pil' requested but Pillow is not importable; "
                "install it or use decoder='fake'/'auto'"
            )
        return _pil_decode
    if decoder in (None, "auto"):
        return _pil_decode if _HAS_PIL else _fake_decode
    raise ValueError(f"unknown decoder: {decoder!r}")


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | str | None = "auto",
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode + feature-extract over binary payloads.

    Arrow batches flow into pandas; the decoder runs per payload
    inside the batch (vectorize inside ``decoder`` if the real kernel
    supports it). Failures surface as decode_ok=False rows rather
    than task failures — at 100 TB a poison payload must not kill the
    stage."""
    decode = _resolve_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(decode(bytes(payload)))
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — Spark plumbing real; the pixel kernel is
    the real Pillow resize when the lib is importable (payloads
    re-encoded as PNG, n_bytes refreshed), else a per-row
    NotImplementedError stub. Kept separate from extract_features so
    the stub boundary is explicit and greppable."""

    if _HAS_PIL:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            for pdf in batches:
                payloads = []
                for payload in pdf["payload"]:
                    img = Image.open(io.BytesIO(bytes(payload))).resize(
                        (width, height)
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    payloads.append(buf.getvalue())
                out = pdf.copy()
                out["payload"] = payloads
                out["n_bytes"] = [len(p) for p in payloads]
                yield out

    else:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                raise NotImplementedError(
                    "image resize requires an imaging library not present "
                    "in this container; inject a kernel or use "
                    "extract_features"
                )
                yield pdf  # pragma: no cover

    return media.mapInPandas(run, media.schema)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    decoder: Callable[[bytes], list[float]] | str | None = "auto",
) -> DataFrame:
    """Video frame-sampling stage: emits (media_id, frame_no, feature)
    rows — a one-to-many mapInPandas (the UDTF shape). Frame decode is
    stubbed with a deterministic fake deriving ``n_frames`` from the
    payload size (1 frame per 64 bytes)."""
    decode = _resolve_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "feature": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = max(1, len(data) // 64)
                for f_no in range(0, n_frames, every_n):
                    chunk = data[f_no * 64 : (f_no + 1) * 64] or data
                    out["media_id"].append(mid)
                    out["frame_no"].append(f_no)
                    out["feature"].append(decode(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id bigint, frame_no int, feature array<float>"
    )


# ----------------------- perceptual near-dup (average hash, r8)


def ahash_from_feature(feature: Column, dim: int = 8) -> Column:
    """Average-hash (aHash) of a decoded feature vector: bit ``i`` is
    set iff element ``i`` strictly exceeds the vector mean. The
    classic perceptual image fingerprint (dHash/pHash siblings share
    the shape) — two images resize/recompress to the same aHash far
    more often than to the same byte hash.

    All INTEGER arithmetic: elements are re-quantized to their byte
    values (``round(f·255)`` — exact for features produced as
    ``byte/255`` at any float width) and the comparison is
    ``q_i · dim > Σq``, so the hash replays bit-for-bit in the DuckDB
    oracle with no float-threshold fragility. Pure expressions, no
    Python boundary."""
    q = F.transform(feature, lambda f: F.round(f * 255).cast("int"))
    s = F.aggregate(q, F.lit(0), lambda acc, x: acc + x)
    # the mean multiplier comes from the ACTUAL vector length, not the
    # ``dim`` parameter — a decoder emitting a different width would
    # otherwise compare against a silently wrong mean (``dim`` remains
    # the documented bit-width contract; positions beyond it would
    # produce >dim-bit hashes, so mismatched widths are a caller bug
    # either way, but the mean stays correct)
    m = F.size(q)
    bits = F.transform(
        q,
        lambda x, i: F.when(
            x * m > s, F.pow(F.lit(2.0), i.cast("double")).cast("int")
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda acc, x: acc + x)


def ahash_near_dups(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | str | None = "auto",
    dim: int = 8,
    max_bucket_size: int | None = 512,
    probe_hamming: int = 0,
) -> DataFrame:
    """Perceptual near-duplicate candidates: decode → aHash → pair
    ids whose hashes differ in at most ``probe_hamming`` bits
    (default 0 = exact-hash buckets). Output ``(a, b, hamming)``,
    a < b, ``hamming`` the bit distance.

    The scale shape is the house capped-bucket candidate generator
    (same as MinHash/SimHash/embedding LSH): hashes are the buckets,
    pairs explode in-bucket only — never a cross join — and
    ``max_bucket_size`` drops degenerate hash cliques whole with an
    ``observe`` metric (a monochrome-thumbnail clique at 100 TB is an
    executor OOM otherwise). Rows that fail decode are excluded (they
    have no perceptual content to compare).

    ``probe_hamming=1`` probes adjacent hashes by registering each id
    under its own hash AND every 1-bit flip (the standard multi-probe
    trick): two ids within Hamming distance 1 then share at least one
    probe bucket. Registration volume multiplies by ``dim + 1`` and
    the bucket cap applies to the PROBE buckets, but pair generation
    is ONE-SIDED: only bucket members whose TRUE hash equals the
    bucket key (the anchors) pair against the rest. A symmetric
    in-bucket explosion would emit ~((dim+1)·n)²/2 candidates, ~79%
    of them probe×probe rows whose true distance is 2 and which the
    distance filter discards anyway; anchoring never generates those
    (anchor.hash == bucket and member within 1 flip of bucket ⇒
    distance ≤ 1 by construction) and still finds every qualifying
    pair — a distance-1 pair's shared buckets are exactly the two
    true hashes, and each is the anchor in its own. Duplicate pairs
    from co-occurring buckets collapse through a distinct on (a, b);
    the emitted ``hamming`` is recomputed exactly from the two ids'
    true hashes (bit_count of xor), never inferred from the bucket.
    Distances ≥ 2 compose the same way but multiply volume by
    ``C(dim, 2)`` — past 1 flip, LSH over more hash bits (SimHash) is
    the better trade, so this operator stops at 1."""
    from pagerank_mapreduce_spark.operators.dedup import (
        explode_member_pairs,
        hot_bucket_guard,
    )

    if probe_hamming not in (0, 1):
        raise ValueError(
            f"probe_hamming must be 0 or 1, got {probe_hamming!r}"
        )
    feats = extract_features(media, decoder)
    hashed = feats.filter(F.col("decode_ok")).select(
        "media_id", ahash_from_feature(F.col("feature"), dim).alias("ahash")
    )
    if probe_hamming == 0:
        probed = hashed.select(
            "media_id", "ahash", F.col("ahash").alias("probe")
        )
    else:
        flips = F.array(
            F.col("ahash"),
            *[
                F.col("ahash").bitwiseXOR(F.lit(1 << i))
                for i in range(dim)
            ],
        )
        probed = hashed.select(
            "media_id", "ahash", F.explode(flips).alias("probe")
        )
    members = (
        probed.groupBy("probe")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "media_id",
                        "ahash",
                        (F.col("ahash") == F.col("probe")).alias(
                            "anchor"
                        ),
                    )
                )
            ).alias("ids")
        )
        .filter(F.size("ids") > 1)
    )
    members = hot_bucket_guard(members, max_bucket_size, "ids")
    if probe_hamming == 0:
        pairs = explode_member_pairs(
            members,
            "ids",
            pair_builder=lambda x, y: F.struct(
                x["media_id"].alias("a"),
                y["media_id"].alias("b"),
                x["ahash"].alias("_ha"),
                y["ahash"].alias("_hb"),
            ),
        )
    else:
        # anchors × everyone-else, JVM-side inside the bucket row;
        # least/greatest normalizes orientation so the cross-bucket
        # distinct below collapses the (at most two) co-occurrences
        anchors = F.filter(F.col("ids"), lambda x: x["anchor"])
        pairs = members.select(
            F.explode(
                F.flatten(
                    F.transform(
                        anchors,
                        lambda x: F.transform(
                            F.filter(
                                F.col("ids"),
                                lambda y: y["media_id"]
                                != x["media_id"],
                            ),
                            lambda y: F.struct(
                                F.least(
                                    x["media_id"], y["media_id"]
                                ).alias("a"),
                                F.greatest(
                                    x["media_id"], y["media_id"]
                                ).alias("b"),
                                x["ahash"].alias("_ha"),
                                y["ahash"].alias("_hb"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.*")
    out = pairs.select(
        "a",
        "b",
        F.bit_count(
            F.col("_ha").bitwiseXOR(F.col("_hb")).cast("long")
        ).alias("hamming"),
    ).filter(F.col("hamming") <= probe_hamming)
    # multi-probe meets a pair in up to two anchored buckets — collapse
    if probe_hamming > 0:
        out = out.distinct()
    return out


# ------------------------- header metadata, pure expressions (r7)
# Real decode needs PIL/libav (auto-selected when present, stubbed
# otherwise — see _resolve_decoder). Container HEADERS do not: the
# fixed-offset fields parse with substring+hex+conv expressions,
# JVM-side inside codegen, no Python round-trip. At 100 TB this is
# the difference between "touch 24 bytes per file" and "ship every
# payload through a Python worker to learn its width". Formats:
#
# - PNG: IHDR is mandatory-first; width/height are big-endian uint32
#   at byte offsets 16 and 20 (0-based) of the file.
# - WAV (canonical RIFF): sample rate is little-endian uint32 at
#   offset 24, channels little-endian uint16 at 22.


def _be_u32(col: Column, pos: int) -> Column:
    """Big-endian uint32 at 0-based byte offset ``pos`` (substring is
    1-based)."""
    return F.conv(F.hex(F.substring(col, pos + 1, 4)), 16, 10).cast("bigint")


def _le_uint(col: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned int: reverse the bytes' hex pairs, then
    one conv."""
    parts = [
        F.hex(F.substring(col, pos + i, 1)) for i in range(nbytes, 0, -1)
    ]
    return F.conv(F.concat(*parts), 16, 10).cast("bigint")


def png_dimensions(payload: Column | str) -> Column:
    """(width, height) struct from a PNG payload's IHDR, or NULL when
    the 8-byte PNG signature is absent (never a crash on junk)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    sig = F.hex(F.substring(c, 1, 8)) == F.lit("89504E470D0A1A0A")
    return F.when(
        sig,
        F.struct(
            _be_u32(c, 16).alias("width"), _be_u32(c, 20).alias("height")
        ),
    )


def wav_audio_meta(payload: Column | str) -> Column:
    """(sample_rate, channels) struct from a canonical RIFF/WAVE
    header, NULL unless both the RIFF and WAVE magics match."""
    c = F.col(payload) if isinstance(payload, str) else payload
    is_wav = (F.hex(F.substring(c, 1, 4)) == F.lit("52494646")) & (
        F.hex(F.substring(c, 9, 4)) == F.lit("57415645")
    )
    return F.when(
        is_wav,
        F.struct(
            _le_uint(c, 24, 4).alias("sample_rate"),
            _le_uint(c, 22, 2).alias("channels"),
        ),
    )
