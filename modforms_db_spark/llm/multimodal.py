"""Multimodal column operators — SURVEY.md §2.11.

Design: image/audio/video are opaque BINARY columns with typed metadata;
the driver data has no real media, so the binary payload is derived
deterministically from text (utf-8 encode) and the generic decode step is
a clearly-marked STUB (deterministic fake; a real deployment swaps
`_decode_image_batch` for a PIL/ffmpeg call — the Spark-side plumbing
(schema, Arrow batching, partitioning) is identical and is what's tested).

Three decode paths ARE real, using only stdlib container parsing —
one per modality: `q_mm_wav_decode` (audio, RIFF/WAVE PCM16 via `wave`),
`q_mm_bmp_decode` (image, 24-bit BMP via `struct`/numpy), and
`q_mm_y4m_frames` (video, YUV4MPEG2 frame sampling) — each writes a
genuine media file and parses it back, hash-checked against oracles that
recompute the stats from the sample/pixel formulas independently of the
byte round-trip.

Reference tie-in [R]: GridFS's metadata+blob split; `check_records`-style
store-consistency scans.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modforms_db_spark.io import load
from modforms_db_spark.oracle_dialect import R4
from modforms_db_spark.registry import register
from modforms_db_spark.session import prep

try:  # real decoder gate — not installed in this container by design
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


@register(
    "q_multimodal_join",
    oracle="""
    SELECT doc_id, n_chars, label,
           CAST(len(embedding) AS INTEGER) AS dim
    FROM documents JOIN embeddings ON doc_id = vec_id
    WHERE lang = 'en' AND label = 3
    """,
    priority="P1",
    tags=("llm", "multimodal"),
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ embedding as one multimodal record (struct column built, scalar
    fields emitted — structs don't hash portably across engines)."""
    prep(spark)
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id).where(
        (F.col("lang") == "en") & (F.col("label") == 3)
    )
    rec = joined.select(
        "doc_id",
        F.struct("text", "embedding").alias("record"),  # the multimodal column
        "n_chars",
        "label",
    )
    return rec.select(
        "doc_id",
        "n_chars",
        "label",
        F.size(F.col("record.embedding")).alias("dim"),
    )


@register(
    "q_mm_length_check",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM documents WHERE n_chars != length(text)) AS n_bad_docs,
      (SELECT COUNT(*) FROM embeddings WHERE len(embedding) != 64)   AS n_bad_vecs,
      (SELECT COUNT(*) FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE e.vec_id IS NULL) AS n_unpaired
    """,
    priority="P2",
    tags=("llm", "multimodal", "consistency"),
)
def q_mm_length_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal consistency scan (`check_records` analogue [R]):
    metadata-vs-payload disagreements and unpaired records."""
    prep(spark)
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    bad_docs = d.where(F.col("n_chars") != F.length("text")).agg(
        F.count(F.lit(1)).alias("n_bad_docs")
    )
    bad_vecs = e.where(F.size("embedding") != 64).agg(
        F.count(F.lit(1)).alias("n_bad_vecs")
    )
    unpaired = (
        d.join(e, d.doc_id == e.vec_id, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_unpaired"))
    )
    return bad_docs.crossJoin(bad_vecs).crossJoin(unpaired)


@register(
    "q_mm_blob_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           hex(encode(substring(text, 1, 4)))         AS header_hex,
           md5(text)                                  AS checksum
    FROM documents
    """,
    priority="P2",
    tags=("llm", "multimodal", "binary"),
)
def q_mm_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary plumbing: build the blob column (utf-8 payload), emit
    typed metadata (byte length, header bytes as hex, checksum) — the
    GridFS metadata-without-blob read [R]. ASCII corpus ⇒ hex(first 4
    chars) is a faithful stand-in for magic-number sniffing."""
    prep(spark)
    d = load(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.hex(F.encode(F.substring("text", 1, 4), "UTF-8")).alias("header_hex"),
        F.md5("text").alias("checksum"),
    )


@register(
    "q_mm_frame_sample",
    oracle="""
    WITH frames AS (
      SELECT doc_id, unnest(range(0, n_chars, 100)) AS frame_off
      FROM documents WHERE n_chars >= 300
    )
    SELECT doc_id, frame_off,
           CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_frames
    FROM frames
    """,
    priority="P2",
    tags=("llm", "multimodal", "video"),
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-shaped blobs: stride offsets into
    the payload (every 100 bytes), exploded to one row per sampled frame.
    The byte-ranges are what a real decoder would seek to."""
    prep(spark)
    d = load(spark, sf_dir, "documents").where(F.col("n_chars") >= 300)
    offs = F.sequence(
        F.lit(0).cast("bigint"),
        F.col("n_chars") - 1,
        F.lit(100).cast("bigint"),
    )
    frames = d.select("doc_id", F.explode(offs).alias("frame_off"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id")
    return frames.select(
        "doc_id",
        "frame_off",
        F.count(F.lit(1)).over(w).alias("n_frames"),
    )


@register(
    "q_mm_image_features",
    oracle=None,  # decode is a stub; plumbing validated by its own test
    priority="P3",
    tags=("llm", "multimodal", "stub"),
)
def q_mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction over binary blobs via mapInPandas.

    STUB decode: the container has no image libraries, so blobs are fake
    (utf-8 text payloads) and `_decode_image_batch` computes deterministic
    pseudo-features (byte stats). With PIL installed, the same function
    body decodes real images — the Spark plumbing (binary column in Arrow
    batches, schema'd output, per-partition execution) is the part under
    test and is real."""
    prep(spark)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_image_batch(pdf)

    return d.mapInPandas(
        decode, "doc_id bigint, width int, height int, mean_byte double"
    )


def _decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB: deterministic fake decode. Real impl would be
    ``PIL.Image.open(io.BytesIO(b))`` per blob; raises if someone expects
    real decoding in an environment that could support it."""
    if _HAVE_PIL:
        raise NotImplementedError(
            "real image decode not wired up — this container was expected "
            "to lack PIL; implement PIL.Image.open here when media libs exist"
        )
    out = {"doc_id": pdf["doc_id"], "width": [], "height": [], "mean_byte": []}
    for b in pdf["blob"]:
        n = len(b)
        out["width"].append(n % 640)
        out["height"].append(n % 480)
        out["mean_byte"].append(float(sum(b)) / n if n else 0.0)
    return pd.DataFrame(out)


@register(
    "q_mm_resize",
    oracle=None,  # stub transform; shape/determinism asserted in tests
    priority="P3",
    tags=("llm", "multimodal", "stub"),
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/resample plumbing: every blob mapped to a fixed-size (64-byte)
    payload by deterministic stride sampling — the shape of image thumbnail
    / audio downsample jobs. STUB math (take every ⌈n/64⌉-th byte); with
    PIL/librosa the same mapInPandas body would call the real resampler.
    Output is binary-in → binary-out, proving blob columns survive the
    Arrow round trip in both directions."""
    prep(spark)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    TARGET = 64

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blobs = []
            for b in pdf["blob"]:
                b = bytes(b)
                step = max(1, -(-len(b) // TARGET))  # ceil
                out_blobs.append(b[::step][:TARGET])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": out_blobs,
                    "thumb_len": [len(t) for t in out_blobs],
                }
            )

    return d.mapInPandas(resize, "doc_id bigint, thumb binary, thumb_len int")


_AUDIO_WIN = 1024
_AUDIO_HOP = 512


def _audio_rms_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decode: treat the blob's bytes as signed 8-bit PCM samples
    (real impl: soundfile/librosa load → float PCM at the stored sample
    rate). The windowing/RMS DSP below is REAL and runs unchanged on a
    true decode — window 1024, hop 512, RMS per window."""
    import numpy as np

    rows = {"doc_id": [], "win_idx": [], "win_start": [], "rms": []}
    for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
        samples = np.frombuffer(b, dtype=np.int8).astype(np.float64) / 128.0
        n = len(samples)
        idx = 0
        for start in range(0, max(n - _AUDIO_WIN + 1, 1), _AUDIO_HOP):
            w = samples[start : start + _AUDIO_WIN]
            if len(w) == 0:
                continue
            rows["doc_id"].append(doc_id)
            rows["win_idx"].append(idx)
            rows["win_start"].append(start)
            rows["rms"].append(float(np.sqrt(np.mean(w * w))))
            idx += 1
    return pd.DataFrame(rows)


@register(
    "q_mm_audio_windows",
    oracle=None,  # stub decode; windowing/determinism asserted in tests
    priority="P3",
    tags=("llm", "multimodal", "audio", "stub"),
)
def q_mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped blob processing: per-document waveform → overlapping
    analysis windows (1024 samples, hop 512) → RMS energy per window, via
    `mapInPandas` (Arrow binary in, long-form frames out) — the VAD /
    silence-trim / loudness-normalization front end of an audio pipeline.

    STUB decode (no audio libs in this container): bytes are read as
    int8 PCM; the windowing and RMS math is real DSP and identical under
    a true decode. Scale: one Arrow hop per partition, output rows =
    ceil(samples/hop) per doc — bounded fan-out, no shuffle until a
    downstream agg.
    """
    prep(spark)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _audio_rms_batch(pdf)

    return d.mapInPandas(
        run, "doc_id bigint, win_idx int, win_start int, rms double"
    )


_WAV_N = 800  # samples per synthetic clip (0.1 s at 8 kHz)
_WAV_SR = 8000


@register(
    "q_mm_wav_decode",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, gs AS i,
             ((doc_id * 31 + gs * 17) % 20001) - 10000 AS v
      FROM documents, UNNEST(generate_series(0, {_WAV_N - 1})) t(gs)
    )
    SELECT doc_id,
           CAST({44 + 2 * _WAV_N} AS BIGINT) AS blob_bytes,
           CAST({_WAV_SR} AS BIGINT) AS sample_rate,
           CAST({_WAV_N} AS BIGINT) AS n_frames,
           {R4(f'SQRT(SUM(CAST(v AS DOUBLE) * v) / {_WAV_N})')} AS rms
    FROM s GROUP BY doc_id
    """,
    priority="P2",
    tags=("llm", "multimodal", "audio", "real-decode"),
)
def q_mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio container round-trip — the one multimodal decode this
    environment can do for real (stdlib `wave`, no external libs):
    synthesize a deterministic PCM16 mono clip per document, WRITE it as
    an actual RIFF/WAVE blob, then PARSE that blob back (44-byte header,
    frame count, sample rate, little-endian frames via numpy) and emit
    waveform stats. Unlike the image/resize STUBS, a broken encoder OR
    decoder here fails the hash: the oracle recomputes the stats from
    the sample formula directly, so the Spark answer is only right if
    the WAV bytes round-tripped exactly.

    Samples are pure integers (((doc_id·31 + i·17) mod 20001) − 10000),
    so Σv² is exact and the RMS is engine-identical before its one r4
    rounding.

    Scale: mapInPandas, Arrow binary batches, ~1.6 KB of blob per doc
    synthesized and parsed inside the task — the exact shape of a real
    decode job where blobs come OFF the parquet scan instead; per-task
    memory is O(batch), and the stats agg is per-row (no shuffle)."""
    import io
    import math
    import struct
    import wave

    import numpy as np

    prep(spark)
    d = load(spark, sf_dir, "documents").select("doc_id")

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "blob_bytes": [], "sample_rate": [],
                   "n_frames": [], "rms": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                samples = [
                    ((doc_id * 31 + i * 17) % 20001) - 10000
                    for i in range(_WAV_N)
                ]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(_WAV_SR)
                    w.writeframes(struct.pack(f"<{_WAV_N}h", *samples))
                blob = buf.getvalue()
                # -- real decode: parse the RIFF container back --------
                with wave.open(io.BytesIO(blob), "rb") as r:
                    assert r.getnchannels() == 1 and r.getsampwidth() == 2
                    sr, nf = r.getframerate(), r.getnframes()
                    data = np.frombuffer(
                        r.readframes(nf), dtype="<i2"
                    ).astype("int64")
                out["doc_id"].append(doc_id)
                out["blob_bytes"].append(len(blob))
                out["sample_rate"].append(sr)
                out["n_frames"].append(nf)
                out["rms"].append(
                    round(math.sqrt(float((data * data).sum()) / nf), 4)
                )
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_decode,
        "doc_id bigint, blob_bytes bigint, sample_rate bigint, "
        "n_frames bigint, rms double",
    )


_BMP_W, _BMP_H = 16, 8  # 24-bit rows are 48 bytes — 4-byte aligned, no pad


@register(
    "q_mm_bmp_decode",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, x.gs AS x, y.gs AS y,
             (doc_id + 3 * x.gs + 7 * y.gs) % 256     AS r,
             (doc_id * 5 + 11 * x.gs + y.gs) % 256    AS g,
             (doc_id * 9 + x.gs + 13 * y.gs) % 256    AS b
      FROM documents,
           UNNEST(generate_series(0, {_BMP_W - 1})) x(gs),
           UNNEST(generate_series(0, {_BMP_H - 1})) y(gs)
    )
    SELECT doc_id,
           CAST({54 + 3 * _BMP_W * _BMP_H} AS BIGINT) AS blob_bytes,
           CAST({_BMP_W} AS BIGINT) AS width,
           CAST({_BMP_H} AS BIGINT) AS height,
           {R4(f'SUM(CAST(r AS DOUBLE)) / {_BMP_W * _BMP_H}')} AS mean_r,
           {R4(f'SUM(CAST(g AS DOUBLE)) / {_BMP_W * _BMP_H}')} AS mean_g,
           {R4(f'SUM(CAST(b AS DOUBLE)) / {_BMP_W * _BMP_H}')} AS mean_b
    FROM px GROUP BY doc_id
    """,
    priority="P2",
    tags=("llm", "multimodal", "image", "real-decode"),
)
def q_mm_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-container round-trip (pure struct/numpy — the image
    twin of `q_mm_wav_decode`): synthesize a deterministic 16×8 24-bit
    pixel grid per document, write an actual BMP file (BITMAPFILEHEADER
    + BITMAPINFOHEADER + bottom-up BGR rows), then parse the blob back
    — magic check, dimensions READ FROM THE HEADER, pixel array
    reshaped and row-flipped — and emit per-channel means. The oracle
    recomputes the means from the pixel formula directly, so a mangled
    header, wrong row order, or channel swap fails the hash.

    Scale: identical posture to q_mm_wav_decode — mapInPandas over
    Arrow binary batches, ~0.4 KB blob per row synthesized and parsed
    in-task, per-row output, no shuffle."""
    import struct

    import numpy as np

    prep(spark)
    d = load(spark, sf_dir, "documents").select("doc_id")
    W, H = _BMP_W, _BMP_H

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "blob_bytes": [], "width": [], "height": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                xs = np.arange(W)[None, :]
                ys = np.arange(H)[:, None]
                r = (doc_id + 3 * xs + 7 * ys) % 256
                g = (doc_id * 5 + 11 * xs + ys) % 256
                b = (doc_id * 9 + xs + 13 * ys) % 256
                img = np.stack([r, g, b], axis=-1).astype(np.uint8)  # (H, W, 3)
                # -- encode: real BMP (BGR byte order, bottom-up rows) --
                px = img[::-1, :, ::-1].tobytes()
                size = 54 + len(px)
                header = struct.pack(
                    "<2sIHHI", b"BM", size, 0, 0, 54
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(px), 2835, 2835, 0, 0
                )
                blob = header + px
                # -- decode: parse the container back ------------------
                assert blob[:2] == b"BM"
                off = struct.unpack_from("<I", blob, 10)[0]
                w_hdr, h_hdr = struct.unpack_from("<ii", blob, 18)
                bpp = struct.unpack_from("<H", blob, 28)[0]
                assert bpp == 24
                arr = (
                    np.frombuffer(blob, dtype=np.uint8, offset=off)
                    .reshape(h_hdr, w_hdr, 3)[::-1, :, ::-1]
                    .astype(np.int64)
                )
                out["doc_id"].append(doc_id)
                out["blob_bytes"].append(len(blob))
                out["width"].append(w_hdr)
                out["height"].append(h_hdr)
                out["mean_r"].append(round(float(arr[:, :, 0].sum()) / (w_hdr * h_hdr), 4))
                out["mean_g"].append(round(float(arr[:, :, 1].sum()) / (w_hdr * h_hdr), 4))
                out["mean_b"].append(round(float(arr[:, :, 2].sum()) / (w_hdr * h_hdr), 4))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_decode,
        "doc_id bigint, blob_bytes bigint, width bigint, height bigint, "
        "mean_r double, mean_g double, mean_b double",
    )


_Y4M_W, _Y4M_H, _Y4M_FRAMES, _Y4M_STRIDE = 8, 4, 12, 4  # sample every 4th


@register(
    "q_mm_y4m_frames",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, f.gs AS frame, x.gs AS x, y.gs AS y,
             (doc_id + 2 * f.gs + 5 * x.gs + 3 * y.gs) % 256 AS luma
      FROM documents,
           UNNEST(generate_series(0, {_Y4M_FRAMES - 1})) f(gs),
           UNNEST(generate_series(0, {_Y4M_W - 1})) x(gs),
           UNNEST(generate_series(0, {_Y4M_H - 1})) y(gs)
      WHERE f.gs % {_Y4M_STRIDE} = 0
    )
    SELECT doc_id, CAST(frame AS BIGINT) AS frame,
           CAST({_Y4M_W} AS BIGINT) AS width,
           CAST({_Y4M_H} AS BIGINT) AS height,
           {R4(f'SUM(CAST(luma AS DOUBLE)) / {_Y4M_W * _Y4M_H}')} AS mean_luma
    FROM px GROUP BY doc_id, frame
    """,
    priority="P2",
    tags=("llm", "multimodal", "video", "real-decode"),
)
def q_mm_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container round-trip — the video member of the
    stdlib-decode trio (`q_mm_wav_decode` audio, `q_mm_bmp_decode`
    image): synthesize a deterministic 12-frame 8×4 mono clip per
    document, write a genuine YUV4MPEG2 (.y4m) stream (ASCII signature
    + parameter header, FRAME markers, raw 4:0:0 luma planes), parse it
    back — dimensions read from the header line, frames located via the
    FRAME delimiters — then FRAME-SAMPLE every 4th frame and emit its
    mean luma. The real form of `q_mm_frame_sample`'s stubbed stride
    sampling; the oracle recomputes sampled-frame means from the pixel
    formula, so a header typo, frame misalignment, or off-by-one in
    the stride fails the hash.

    Scale: mapInPandas over Arrow binary batches; a real job reads the
    blob column off the scan, and frame sampling is exactly this —
    parse header, seek k·stride offsets, never materialize unsampled
    frames (here the clip is synthesized in-task, but the decode path
    indexes directly to sampled frames the same way)."""
    import numpy as np

    prep(spark)
    d = load(spark, sf_dir, "documents").select("doc_id")
    W, H, NF, STRIDE = _Y4M_W, _Y4M_H, _Y4M_FRAMES, _Y4M_STRIDE

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame": [], "width": [], "height": [],
                   "mean_luma": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                xs = np.arange(W)[None, :]
                ys = np.arange(H)[:, None]
                frames = [
                    ((doc_id + 2 * f + 5 * xs + 3 * ys) % 256).astype(np.uint8)
                    for f in range(NF)
                ]
                blob = (f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 Cmono\n").encode()
                for fr in frames:
                    blob += b"FRAME\n" + fr.tobytes()
                # -- decode: parse the stream back ---------------------
                nl = blob.index(b"\n")
                header = blob[:nl].decode().split(" ")
                assert header[0] == "YUV4MPEG2"
                w_hdr = int(next(p[1:] for p in header if p.startswith("W")))
                h_hdr = int(next(p[1:] for p in header if p.startswith("H")))
                frame_bytes = w_hdr * h_hdr  # 4:0:0 — luma plane only
                pos, idx = nl + 1, 0
                while pos < len(blob):
                    assert blob[pos:pos + 6] == b"FRAME\n"
                    pos += 6
                    if idx % STRIDE == 0:  # frame-sample: decode every k-th
                        plane = np.frombuffer(
                            blob, dtype=np.uint8, offset=pos, count=frame_bytes
                        ).astype(np.int64)
                        out["doc_id"].append(doc_id)
                        out["frame"].append(idx)
                        out["width"].append(w_hdr)
                        out["height"].append(h_hdr)
                        out["mean_luma"].append(
                            round(float(plane.sum()) / frame_bytes, 4)
                        )
                    pos += frame_bytes
                    idx += 1
            yield pd.DataFrame(out)

    return d.mapInPandas(
        synth_decode,
        "doc_id bigint, frame bigint, width bigint, height bigint, "
        "mean_luma double",
    )
