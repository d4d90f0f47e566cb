"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (the training-data-pipeline extension the driver's north star
asks for).

Schema convention:
    media: binary                      -- the raw payload (opaque)
    media_meta: struct<kind string, n_bytes bigint, width int,
                       height int, sample_rate int, n_frames int>

The real decode libraries (ffmpeg/torchaudio) are NOT in this
container, so decoding is layered behind the same Spark plumbing
(Arrow-batched ``mapInPandas``, partition-parallel, schema-stable):

- ``decode_image_meta``: a deterministic fake decoder that parses the
  payload's leading bytes as (width, height) — real batch shape, real
  schema, fake pixels; lets every downstream op (resize bookkeeping,
  frame sampling, feature hashing) be exercised and tested.
- ``decode_image_pixels``: a REAL image decode — Pillow when
  importable on the executors, else the package's stdlib PNG decoder
  (``png_gray``) for PNG payloads and the stdlib baseline JPEG
  decoder (``jpeg_gray``) for grayscale JPEGs — with the
  deterministic fake-codec contract as the final fallback for
  anything else or corrupt bytes; same output schema on every path,
  ``px_codec`` records which ran.
- ``decode_audio_samples``: the audio mirror — RIFF/WAVE integer PCM
  through the stdlib ``wav_pcm`` decoder, fake-codec fallback for
  everything else, ``au_codec`` records which ran.

``attach_fake_media`` derives payloads deterministically from an id
column so fixtures exist at every scale factor.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "kind string, n_bytes bigint, width int, height int, "
    "sample_rate int, n_frames int"
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary payload per row: 16-byte header (width,
    height, sample_rate, n_frames as little-endian uint32, derived from
    the id) + md5-stream body. Kind cycles image/audio/video."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            kinds = []
            for i in pdf[id_col]:
                i = int(i)
                w = 16 + (i * 7919) % 2032
                h = 16 + (i * 104729) % 2032
                sr = 8000 + (i % 5) * 8000
                nf = 1 + (i * 31) % 240
                header = struct.pack("<IIII", w, h, sr, nf)
                body = hashlib.md5(str(i).encode()).digest() * 4
                payloads.append(header + body)
                kinds.append(("image", "audio", "video")[i % 3])
            pdf = pdf.copy()
            pdf["media"] = payloads
            pdf["media_kind"] = kinds
            yield pdf

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        gen, schema=f"{schema}, media binary, media_kind string"
    )


def decode_image_meta(
    df: DataFrame, media_col: str = "media", kind_col: str = "media_kind"
) -> DataFrame:
    """STUB DECODER (deterministic fake): parse the 16-byte header into
    typed metadata. Real pipelines replace the body of ``_parse`` with
    an actual image decode; the mapInPandas batching, schema, and
    partition behavior are production-shaped already. Column presence
    is validated at plan construction (a missing column would
    otherwise surface as an opaque executor-side KeyError)."""
    for c in (media_col, kind_col):
        if c not in df.columns:
            raise ValueError(f"decode_image_meta: column {c!r} not in input")

    _META_FIELDS = (
        "kind", "n_bytes", "width", "height", "sample_rate", "n_frames"
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload, kind in zip(pdf[media_col], pdf[kind_col]):
                b = bytes(payload)
                w, h, sr, nf = struct.unpack_from("<IIII", b, 0)
                metas.append(
                    {
                        "kind": kind,
                        "n_bytes": len(b),
                        "width": int(w),
                        "height": int(h),
                        "sample_rate": int(sr),
                        "n_frames": int(nf),
                    }
                )
            out = pdf.copy()
            # assign every declared column unconditionally: an EMPTY
            # Arrow batch must still yield all meta_* columns or the
            # mapInPandas schema check fails executor-side
            for c in _META_FIELDS:
                out[f"meta_{c}"] = [m[c] for m in metas]
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        _parse,
        schema=(
            f"{schema}, meta_kind string, meta_n_bytes bigint, "
            "meta_width int, meta_height int, meta_sample_rate int, "
            "meta_n_frames int"
        ),
    )


def png_gray(b: bytes) -> "tuple[int, int, np.ndarray] | None":
    """Stdlib PNG decode to an 8-bit grayscale raster: (w, h, pixels)
    or None when ``b`` is not a PNG this decoder handles. A REAL
    codec — signature check, IHDR parse, zlib-inflated IDAT, full
    scanline unfiltering (None/Sub/Up/Average/Paeth) — built from
    zlib + struct only, so the real-decode path of
    ``decode_image_pixels`` is exercisable in containers without
    Pillow. Supports the common crawl shapes: bit depth 8, color
    types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), interlace 0;
    anything else returns None and the caller falls back.

    Grayscale conversion matches Pillow's ``convert("L")`` integer
    kernel — ``(19595*R + 38470*G + 7471*B + 0x8000) >> 16`` (ITU-R
    601-2 luma, round-half-up in fixed point) — so the PIL and stdlib
    paths produce identical rasters for the supported shapes and the
    pixel-stat columns do not depend on which codec ran.

    Cost note: unfiltering is row-sequential Python/numpy — fine for
    thumbnail/test rasters; executors with Pillow installed take the
    C path first and never reach this."""
    import zlib

    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, meta = 8, [], None
    try:
        while pos + 8 <= len(b):
            (ln,) = struct.unpack_from(">I", b, pos)
            typ = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, ctype, comp, filt, inter = struct.unpack(
                    ">IIBBBBB", data
                )
                meta = (w, h, depth, ctype, comp, filt, inter)
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
            pos += 12 + ln
        if meta is None or not idat:
            return None
        w, h, depth, ctype, comp, filt, inter = meta
        if depth != 8 or comp != 0 or filt != 0 or inter != 0:
            return None
        nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
        if nch is None or w == 0 or h == 0:
            return None
        raw = zlib.decompress(b"".join(idat))
    except Exception:
        return None
    stride = w * nch
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:
            rec = (line + prior) & 0xFF
        else:
            rec = line.copy()
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                bb = prior[i]
                c = prior[i - nch] if i >= nch else 0
                if f == 1:
                    rec[i] = (rec[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (rec[i] + ((a + bb) >> 1)) & 0xFF
                elif f == 4:
                    pp = a + bb - c
                    pa, pb, pc = abs(pp - a), abs(pp - bb), abs(pp - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        bb if pb <= pc else c
                    )
                    rec[i] = (rec[i] + pred) & 0xFF
                else:
                    return None
        out[y] = rec.astype(np.uint8)
        prior = rec.astype(np.int32)
    px = out.reshape(h, w, nch).astype(np.int64)
    if ctype == 0:
        gray = px[:, :, 0]
    elif ctype == 4:
        gray = px[:, :, 0]  # PIL L of LA drops alpha
    else:  # RGB / RGBA: PIL's fixed-point ITU-R 601-2 kernel
        gray = (
            19595 * px[:, :, 0]
            + 38470 * px[:, :, 1]
            + 7471 * px[:, :, 2]
            + 0x8000
        ) >> 16
    return int(w), int(h), gray.astype(np.uint8).ravel()


def _jpeg_huff_table(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(length, code) -> value} from the
    DHT segment's 16 length counts + value list (ISO 10918-1 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    byte-unstuffing; RSTn markers reset the stream (handled by caller
    via ``at_marker``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        byte = d[self.pos]
        if byte == 0xFF:
            if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                self.pos += 2  # stuffed FF
            else:
                return False  # a real marker: stop
        else:
            self.pos += 1
        # mask to the live bits before shifting: an unmasked
        # accumulator grows into an unbounded bignum and turns the
        # entropy decode quadratic (measured 47 s on 200 KB of data)
        self.bitbuf = (
            (self.bitbuf & ((1 << self.nbits) - 1)) << 8
        ) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            bit = self.read_bit()
            if bit is None:
                return None
            v = (v << 1) | bit
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for ln in range(1, 17):
            bit = self.read_bit()
            if bit is None:
                return None
            code = (code << 1) | bit
            v = table.get((ln, code))
            if v is not None:
                return v
        return None

    def byte_align_and_skip_rst(self) -> bool:
        """At a restart interval boundary: drop partial bits, expect
        and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and (
            0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False


# zigzag scan order: index i of the scan -> (row, col) flat offset
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# separable 8-point IDCT basis: P = B^T K B with
# B[u,x] = c(u)/2 * cos((2x+1) u pi / 16)
_IDCT_B = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _jpeg_extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (ISO 10918-1 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_gray(b: bytes) -> "tuple[int, int, np.ndarray] | None":
    """Stdlib BASELINE JPEG decode to an 8-bit grayscale raster:
    (w, h, pixels) or None when ``b`` is not a JPEG this decoder
    handles. A REAL codec — marker walk, DQT dequantization tables,
    canonical DHT Huffman decode (DC difference + AC run/length with
    EOB/ZRL), optional DRI/RSTn restart intervals, zigzag
    de-serialization, separable floating-point IDCT with
    floor(x+0.5) round-half-up descaling, +128 level shift, clip —
    built from
    struct + numpy only, the JPEG sibling of ``png_gray`` (r9 VERDICT
    item 5: no fake-pixel tier left for the common image formats).

    Scope (the honest subset, anything else returns None and the
    caller falls back): baseline sequential DCT (SOF0), 8-bit
    precision, SINGLE-component (grayscale) scans. Color (YCbCr)
    JPEGs need chroma upsampling + the libjpeg fixed-point color
    convert to claim PIL parity honestly, so they take the PIL tier
    (when installed) or the fake fallback rather than a
    close-but-unpinned path.

    Parity pinning (tests/test_round10.py): flat (DC-only) blocks
    decode EXACTLY; crafted single-AC blocks match an independently
    derived direct-summation IDCT exactly; full encode->decode
    roundtrips with an in-test baseline encoder at quantization 1
    reconstruct every pixel within +-1 (the DCT float floor); and an
    env-gated pytest compares against Pillow byte-for-byte when it is
    importable.
    """
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    try:
        pos = 2
        qt: dict[int, np.ndarray] = {}
        huff_dc: dict[int, dict] = {}
        huff_ac: dict[int, dict] = {}
        restart = 0
        w = h = 0
        comp_q = comp_dc = comp_ac = 0
        sof_seen = False
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker == 0xD9:  # EOI
                return None  # reached EOI before any scan
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            seg = b[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    prec, tid = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    if prec == 0:
                        tbl = np.frombuffer(
                            seg[i : i + 64], dtype=np.uint8
                        ).astype(np.int64)
                        i += 64
                    else:
                        tbl = np.frombuffer(
                            seg[i : i + 128], dtype=">u2"
                        ).astype(np.int64)
                        i += 128
                    qt[tid] = tbl
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8 or ncomp != 1 or w == 0 or h == 0:
                    return None
                # component spec at seg[5+1:]: id, sampling (must be
                # 1x1), qtable id
                samp = seg[7]
                if samp != 0x11:
                    return None
                comp_q = seg[8]
                sof_seen = True
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                            0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline SOF
            elif marker == 0xC4:  # DHT
                i = 0
                while i + 17 <= len(seg):
                    cls, tid = seg[i] >> 4, seg[i] & 0x0F
                    bits = seg[i + 1 : i + 17]
                    nv = sum(bits)
                    vals = seg[i + 17 : i + 17 + nv]
                    tbl = _jpeg_huff_table(bits, vals)
                    (huff_dc if cls == 0 else huff_ac)[tid] = tbl
                    i += 17 + nv
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                if ns != 1 or not sof_seen:
                    return None
                comp_dc = seg[2] >> 4
                comp_ac = seg[2] & 0x0F
                pos = pos + 2 + seglen
                break
            pos += 2 + seglen
        else:
            return None
        if comp_q not in qt or comp_dc not in huff_dc or comp_ac not in huff_ac:
            return None
        q = qt[comp_q]
        dctbl, actbl = huff_dc[comp_dc], huff_ac[comp_ac]
        bw, bh = (w + 7) // 8, (h + 7) // 8
        out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
        reader = _JpegBitReader(b, pos)
        pred = 0
        nblock = 0
        for by in range(bh):
            for bx in range(bw):
                if restart and nblock and nblock % restart == 0:
                    if not reader.byte_align_and_skip_rst():
                        return None
                    pred = 0
                nblock += 1
                coef = np.zeros(64, dtype=np.int64)
                t = reader.decode_huff(dctbl)
                if t is None or t > 11:
                    return None
                diff = reader.read_bits(t)
                if diff is None:
                    return None
                pred += _jpeg_extend(diff, t)
                coef[0] = pred
                k = 1
                while k < 64:
                    rs = reader.decode_huff(actbl)
                    if rs is None:
                        return None
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        return None
                    v = reader.read_bits(s)
                    if v is None:
                        return None
                    coef[k] = _jpeg_extend(v, s)
                    k += 1
                # coef and the DQT table are both in zigzag scan
                # order; de-zigzag the dequantized values in one go
                block = np.zeros(64, dtype=np.int64)
                block[_JPEG_ZIGZAG] = coef * q
                spatial = _IDCT_B.T @ block.reshape(8, 8) @ _IDCT_B
                # floor(x+0.5) round-half-UP descale + level shift —
                # an explicit deterministic rounding contract, like
                # the PNG tier's
                px = np.floor(spatial + 0.5).astype(np.int64) + 128
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    px, 0, 255
                ).astype(np.uint8)
        return int(w), int(h), out[:h, :w].ravel()
    except Exception:
        return None


def wav_pcm(b: bytes) -> "tuple[int, int, np.ndarray] | None":
    """Stdlib WAV decode to integer PCM samples:
    (sample_rate, n_channels, samples) or None when ``b`` is not a
    RIFF/WAVE payload this decoder handles — the AUDIO sibling of
    ``png_gray``/``jpeg_gray``. A REAL codec: RIFF header walk
    (chunk-aligned, unknown chunks skipped), ``fmt `` parse, and
    little-endian PCM sample decode for format 1 (integer PCM) at
    8/16/24/32-bit widths. 8-bit WAV is unsigned by spec and is
    recentered to signed (-128..127) so every width reports samples on
    a signed scale; 24-bit is sign-extended from 3-byte frames.
    ``samples`` is channel-INTERLEAVED exactly as stored (callers
    slice ``samples[c::n_channels]`` for one channel). Float PCM
    (format 3), extensible (0xFFFE), compressed formats, and
    truncated/odd payloads return None and the caller falls back.
    """
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8 : pos + 8 + clen]
            if len(body) < clen:
                return None
            if cid == b"fmt ":
                if clen < 16:
                    return None
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            # chunks are word-aligned: odd sizes carry a pad byte
            pos += 8 + clen + (clen & 1)
        if fmt is None or data is None:
            return None
        audio_fmt, nch, sr, _byte_rate, _block, bits = fmt
        if audio_fmt != 1 or nch == 0 or sr == 0:
            return None
        if bits == 8:
            samples = (
                np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
            )
        elif bits == 16:
            samples = np.frombuffer(
                data[: len(data) - (len(data) % 2)], dtype="<i2"
            ).astype(np.int32)
        elif bits == 24:
            n = len(data) // 3
            raw = np.frombuffer(data[: n * 3], dtype=np.uint8).reshape(n, 3)
            v = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            samples = np.where(v >= 1 << 23, v - (1 << 24), v)
        elif bits == 32:
            samples = np.frombuffer(
                data[: len(data) - (len(data) % 4)], dtype="<i4"
            ).astype(np.int64)
        else:
            return None
        # drop a trailing partial frame so channels stay aligned
        n_full = (len(samples) // nch) * nch
        return int(sr), int(nch), samples[:n_full]
    except Exception:
        return None


def decode_audio_samples(
    df: DataFrame, media_col: str = "media", header_bytes: int = 16
) -> DataFrame:
    """Audio-sample decode with a REAL codec when the payload is one —
    the audio mirror of ``decode_image_pixels``: RIFF/WAVE integer-PCM
    payloads go through ``wav_pcm`` (``au_codec='wav'``); anything
    else falls back to the deterministic fake-codec contract (16-byte
    ``<IIII`` header carrying the sample rate, body bytes as unsigned
    8-bit samples — ``au_codec='raw'``), so the operator is total and
    schema-stable in every environment, and corrupt crawl audio takes
    the fallback instead of killing the Arrow batch.

    Output adds: ``au_codec``, ``au_sr``, ``au_channels``, ``au_n``
    (samples, all channels), ``au_mean``, ``au_std`` (round 6,
    population, exact integer sum / sum-of-squares — the
    ``decode_image_pixels`` stats discipline), ``au_min``, ``au_max``.

    Scale shape: one Arrow ``mapInPandas`` projection, no shuffle —
    decode-at-ingest, features downstream."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict = {c: [] for c in (
                "au_codec", "au_sr", "au_channels", "au_n",
                "au_mean", "au_std", "au_min", "au_max",
            )}
            for payload in pdf[media_col]:
                b = bytes(payload)
                wav = wav_pcm(b)
                if wav is not None:
                    sr, nch, body = wav
                    codec = "wav"
                else:
                    nch = 1
                    sr = 0
                    # guard on the 16 bytes the unpack actually needs,
                    # not header_bytes (a smaller header_bytes must not
                    # let short payloads raise struct.error mid-batch)
                    if len(b) >= 16:
                        _w, _h, sr, _nf = struct.unpack_from("<IIII", b, 0)
                    body = np.frombuffer(b[header_bytes:], dtype=np.uint8)
                    codec = "raw"
                mean, std, mn, mx = _int_stats(body)
                n = len(body)
                cols["au_codec"].append(codec)
                cols["au_sr"].append(int(sr))
                cols["au_channels"].append(int(nch))
                cols["au_n"].append(n)
                cols["au_mean"].append(round(mean, 6))
                cols["au_std"].append(round(std, 6))
                cols["au_min"].append(mn)
                cols["au_max"].append(mx)
            out = pdf.copy()
            for c, vals in cols.items():
                out[c] = vals
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        _decode,
        schema=(
            # au_sr is bigint: the raw-fallback header field is an
            # unsigned <I up to 4294967295, which an int32 column
            # would wrap negative (or fail under safe Arrow casts)
            f"{schema}, au_codec string, au_sr bigint, au_channels int, "
            "au_n bigint, au_mean double, au_std double, "
            "au_min bigint, au_max bigint"
        ),
    )


def _int_stats(body: np.ndarray) -> "tuple[float, float, int, int]":
    """(mean, std, min, max) over integer samples in the exact
    sum / sum-of-squares form (population std; callers round).
    Shared by the image and audio decoders so the accumulator
    discipline lives in ONE place. Bodies up to 16-bit ride int64
    accumulators (overflow needs >= 2^33 samples per row); wider PCM
    (24/32-bit) accumulates on Python ints — an int64 sum-of-squares
    wraps after just TWO full-scale 32-bit samples and would emit
    negative variance / NaN std."""
    n = len(body)
    if n == 0:
        return 0.0, 0.0, 0, 0
    if body.dtype.itemsize <= 2:
        s = int(body.sum(dtype=np.int64))
        s2 = int((body.astype(np.int64) ** 2).sum(dtype=np.int64))
    else:
        ob = body.astype(object)
        s = int(ob.sum())
        s2 = int((ob * ob).sum())
    mean = s / n
    std = float(np.sqrt((s2 - s * s / n) / n))
    return mean, std, int(body.min()), int(body.max())


def pil_available() -> bool:
    """True when Pillow is importable in THIS interpreter — callers
    (and the auto-skipping decode pytest) use it to know which codec
    ``decode_image_pixels`` will run."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_pixels(
    df: DataFrame, media_col: str = "media", header_bytes: int = 16
) -> DataFrame:
    """Pixel decode with a REAL codec when one exists, in three
    tiers: (1) when Pillow is importable on the executors, each
    payload is decoded as an actual image container (JPEG/PNG/anything
    PIL reads) and converted to 8-bit grayscale; (2) otherwise —
    this container — PNG payloads go through the package's own
    stdlib decoder (``png_gray``: zlib-inflated IDAT + full scanline
    unfiltering, PIL-parity grayscale kernel) and baseline grayscale
    JPEG payloads through ``jpeg_gray`` (marker walk + canonical
    Huffman + dequant + IDCT), so a REAL decode path runs and is
    pytest-pinned even without Pillow; (3) anything else
    falls back to the deterministic fake-codec contract (16-byte
    ``<IIII`` header + raw-uint8 body), so the operator is total in
    every environment and the output SCHEMA is identical on all
    paths. A payload no codec can parse (crawl data always carries
    corrupt images) takes tier 3 instead of killing the Arrow batch.

    Output adds: ``px_codec`` ('pil' | 'png' | 'jpeg' | 'raw'),
    ``px_w``, ``px_h``
    (decoder-reported dimensions; header dimensions on the raw path),
    ``px_n``, ``px_mean``, ``px_std`` (round 6, population, exact
    integer sum/sum-of-squares form shared with
    ``extract_media_features``), ``px_min``, ``px_max``.

    Scale shape: one Arrow ``mapInPandas`` projection, no shuffle —
    decode cost rides the scan, exactly where a 100 TB media pipeline
    wants it (decode-at-ingest, features downstream)."""
    import io

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None
        for pdf in batches:
            cols: dict = {c: [] for c in (
                "px_codec", "px_w", "px_h", "px_n",
                "px_mean", "px_std", "px_min", "px_max",
            )}
            for payload in pdf[media_col]:
                b = bytes(payload)
                body = None
                codec = "raw"
                w = h = 0
                if _Image is not None:
                    try:
                        img = _Image.open(io.BytesIO(b)).convert("L")
                        w, h = img.size
                        body = np.asarray(img, dtype=np.uint8).ravel()
                        codec = "pil"
                    except Exception:
                        body = None
                if body is None:
                    png = png_gray(b)
                    if png is not None:
                        w, h, body = png
                        codec = "png"
                if body is None:
                    jpg = jpeg_gray(b)
                    if jpg is not None:
                        w, h, body = jpg
                        codec = "jpeg"
                if body is None:
                    # the header unpack needs 16 bytes regardless of
                    # where the caller says the body starts
                    if len(b) >= 16:
                        w, h, _sr, _nf = struct.unpack_from("<IIII", b, 0)
                    body = np.frombuffer(b[header_bytes:], dtype=np.uint8)
                mean, std, mn, mx = _int_stats(body)
                n = len(body)
                cols["px_codec"].append(codec)
                cols["px_w"].append(int(w))
                cols["px_h"].append(int(h))
                cols["px_n"].append(n)
                cols["px_mean"].append(round(mean, 6))
                cols["px_std"].append(round(std, 6))
                cols["px_min"].append(mn)
                cols["px_max"].append(mx)
            out = pdf.copy()
            for c, vals in cols.items():
                out[c] = vals
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        _decode,
        schema=(
            f"{schema}, px_codec string, px_w int, px_h int, "
            "px_n bigint, px_mean double, px_std double, "
            "px_min int, px_max int"
        ),
    )


def extract_media_features(
    df: DataFrame, media_col: str = "media", header_bytes: int = 16
) -> DataFrame:
    """DETERMINISTIC FAKE pixel decode + feature extraction: parse the
    payload BODY (everything after the metadata header) as raw uint8
    pixels and emit per-row byte statistics. The decode is fake (no
    image libs in this container) but the PLUMBING is the production
    shape end-to-end: opaque binary flows through Arrow batches into
    numpy inside mapInPandas, and schema-stable numeric features come
    out — swap the frombuffer line for a real JPEG decode + embedding
    model and nothing else changes.

    Stats use the exact integer sum / sum-of-squares form (population
    std), so the DuckDB oracle reproduces them bit-for-bit from the
    payload construction.

    Output adds: px_n (body bytes), px_mean, px_std (round 6),
    px_min, px_max.
    """

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_, mean_, std_, mn_, mx_ = [], [], [], [], []
            for payload in pdf[media_col]:
                body = np.frombuffer(
                    bytes(payload)[header_bytes:], dtype=np.uint8
                )
                mean, std, mn, mx = _int_stats(body)
                n_.append(len(body))
                mean_.append(round(mean, 6))
                std_.append(round(std, 6))
                mn_.append(mn)
                mx_.append(mx)
            out = pdf.copy()
            out["px_n"] = pd.Series(n_, dtype="int64").to_numpy()
            out["px_mean"] = mean_
            out["px_std"] = std_
            out["px_min"] = pd.Series(mn_, dtype="int32").to_numpy()
            out["px_max"] = pd.Series(mx_, dtype="int32").to_numpy()
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        _feats,
        schema=(
            f"{schema}, px_n bigint, px_mean double, px_std double, "
            "px_min int, px_max int"
        ),
    )


def resize_meta(
    df: DataFrame, max_side: int = 512
) -> DataFrame:
    """Resize BOOKKEEPING (the metadata half of a resize op): compute
    target dimensions preserving aspect ratio — native column math; the
    pixel transform itself plugs into the decode stub.

    The math is ``floor(side * max_side / longest)`` over exact
    integers (one correctly-rounded division of integer-valued
    doubles), NOT ``side * (max_side/longest)`` — multiplying by a
    pre-rounded ratio loses the longest-side == max_side contract for
    thousands of widths (e.g. 561 * (512/561) floors to 511)."""
    w, h = F.col("meta_width"), F.col("meta_height")
    longest = F.greatest(w, h)
    needs = longest > F.lit(int(max_side))

    def _target(side):
        return (
            F.when(needs, F.floor((side * F.lit(int(max_side))) / longest))
            .otherwise(side)
            .cast("int")
        )

    return df.withColumn("target_width", _target(w)).withColumn(
        "target_height", _target(h)
    )


def sample_frames(
    df: DataFrame, every_n: int = 10
) -> DataFrame:
    """Frame sampling as a table-generating op: one row per sampled
    frame index (native sequence+explode over n_frames metadata) —
    the downstream per-frame decode then runs partition-parallel over
    an already-exploded table. Zero-frame (or NULL-metadata) media
    emit NO rows — the same spurious-empty-chunk guard chunk_audio
    carries."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    return df.filter(F.col("meta_n_frames") > 0).withColumn(
        "frame_idx",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta_n_frames") - 1,
                F.lit(int(every_n)),
            )
        ),
    )


def media_feature_hash(
    df: DataFrame, media_col: str = "media", n_features: int = 8
) -> DataFrame:
    """Cheap content feature: md5-derived integer features of the
    payload (stand-in for an embedding; deterministic, schema-real)."""
    # salt the digest per feature index: one md5 only has 4 disjoint
    # 8-hex windows, so features beyond 4 would duplicate earlier ones
    cols = [
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(media_col), F.lit(f"_f{i}".encode()))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias(f"f{i}")
        for i in range(n_features)
    ]
    return df.select("*", *cols)


def chunk_audio(
    df: DataFrame,
    chunk_s: float = 1.0,
    bytes_per_sample: int = 2,
) -> DataFrame:
    """Audio chunking as a table-generating op (the audio sibling of
    ``sample_frames``): one row per fixed-duration chunk, with
    ``chunk_idx``, ``start_sample`` and ``n_samples`` derived from the
    sample-rate/byte-count metadata (16-bit mono by default). Native
    sequence+explode — the per-chunk decode/feature stage downstream
    runs partition-parallel over an already-exploded table; the final
    partial chunk is emitted with its true (shorter) length."""
    total = (F.col("meta_n_bytes") / F.lit(int(bytes_per_sample))).cast(
        "long"
    )
    step = (F.col("meta_sample_rate") * F.lit(float(chunk_s))).cast("long")
    # a zero-byte payload must yield ZERO chunk rows, not one empty
    # chunk (sequence(0, greatest(-1,0)) = [0] would emit a spurious
    # n_samples=0 row into the downstream per-chunk decode)
    out = df.withColumn("_total_samples", total).filter(
        F.col("_total_samples") > 0
    ).withColumn(
        "start_sample",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("_total_samples") - 1, F.lit(0)),
                F.greatest(step, F.lit(1)),
            )
        ),
    )
    return (
        out.withColumn(
            "chunk_idx",
            (F.col("start_sample") / F.greatest(step, F.lit(1)))
            .cast("long"),
        )
        .withColumn(
            "n_samples",
            F.least(
                F.greatest(step, F.lit(1)),
                F.col("_total_samples") - F.col("start_sample"),
            ),
        )
        .drop("_total_samples")
    )


def frame_signature_expr(
    media_col: str = "media", frame_idx_col: str = "frame_idx"
) -> "F.Column":
    """Frame content signature from the REAL payload bytes: md5 over
    (hex of the first body block || '_' || frame index). The fake
    payload's body is a repeated md5 digest (attach_fake_media), so
    the signature is derivable BOTH from the binary column (this
    expression — the production shape: hash what you decoded) and
    from the id arithmetic (the DuckDB oracle) — a genuine
    cross-derivation of the same value."""
    return F.md5(
        F.concat(
            F.lower(F.hex(F.substring(F.col(media_col), 17, 16))),
            F.lit("_"),
            F.col(frame_idx_col).cast("string"),
        )
    )


def dedup_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    every_n: int = 10,
) -> DataFrame:
    """Cross-video duplicate-frame report: sample frames
    (``sample_frames``), fingerprint each sampled frame from the
    payload bytes, and report signatures seen in MORE THAN ONE video
    — the dedup primitive for re-uploaded/re-encoded video content
    (frame-hash dedup is the standard first pass before expensive
    perceptual hashing).

    Columns: ``(frame_sig, n_frames, n_docs)``, only signatures with
    ``n_docs > 1``.

    Scale shape: explode is bounded by frames/every_n per video; the
    one exchange is the signature aggregate (partial-combined — a
    viral frame concentrates counts, not rows).
    """
    frames = sample_frames(df, every_n)
    per = frames.select(
        F.col(id_col).alias("_vid"),
        frame_signature_expr(media_col).alias("frame_sig"),
    )
    return (
        per.groupBy("frame_sig")
        .agg(
            F.count("*").alias("n_frames"),
            F.countDistinct("_vid").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


def scene_signature_expr(
    media_col: str = "media",
    frame_idx_col: str = "frame_idx",
    scene_len: int = 30,
) -> "F.Column":
    """Scene-level content signature of a sampled frame: md5 over
    (hex of the first body block || '_s' || frame_idx div scene_len).
    Under the fake decoder a video's content is constant within each
    ``scene_len``-frame block (the stub stands in for "decode the
    frame, hash its pixels" — consecutive frames of one scene hash
    equal, a cut changes the hash), so scene detection downstream is
    exercised end-to-end while the pixel decode itself stays the
    documented environment-gated stub."""
    return F.md5(
        F.concat(
            F.lower(F.hex(F.substring(F.col(media_col), 17, 16))),
            F.lit("_s"),
            F.expr(f"CAST({frame_idx_col} div {int(scene_len)} AS STRING)"),
        )
    )


def scene_changes(
    df: DataFrame,
    every_n: int = 5,
    scene_len: int = 30,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Per-video scene segmentation over sampled frames: order the
    sampled frames, fingerprint each (``scene_signature_expr``), and
    count signature RUNS (a change between consecutive sampled frames
    is a cut) — the shot-boundary report a video-curation pipeline
    logs before per-scene captioning/sampling.

    Columns: ``(doc_id, n_sampled, n_scenes)`` — n_scenes = 1 + number
    of consecutive-signature changes; zero-frame media emit no row.

    Scale shape: ``sample_frames``' explode, ONE video-keyed window
    for the lag compare (frames of a video are sequence-bounded), one
    partial-combined rollup. The signature is computed from the
    payload bytes — the production shape survives when the stub
    decoder is swapped for a real one.
    """
    from pyspark.sql import Window

    frames = sample_frames(df, every_n).withColumn(
        "_sig", scene_signature_expr(media_col, "frame_idx", scene_len)
    )
    w = Window.partitionBy(id_col).orderBy("frame_idx")
    chg = (
        F.when(
            F.lag("_sig").over(w).isNotNull()
            & (F.col("_sig") != F.lag("_sig").over(w)),
            1,
        )
        .otherwise(0)
    )
    return (
        frames.withColumn("_chg", chg)
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            (F.sum("_chg") + 1).cast("bigint").alias("n_scenes"),
        )
    )
