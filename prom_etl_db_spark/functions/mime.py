"""MIME type sniffing over binary payloads (WHATWG MIME Sniffing).

Reference scope: samzong/prom-etl-db has no media surface; this is a
§2.E training-data-pipeline extension (round 6) — a crawl pipeline must
route each fetched payload to the right decoder (HTML→text extraction,
image/audio codecs, archive handling) from its BYTES, because crawl
Content-Type headers are wrong often enough that every production
pipeline sniffs. The public spec implemented is the WHATWG MIME
Sniffing standard (mimesniff.spec.whatwg.org) §6-§7: the pattern
matching algorithm (exact byte signatures with leading-whitespace-
skipping, case-insensitive tag patterns for HTML/XML) and the
binary-data-byte heuristic for the text/plain vs octet-stream split.

Documented subset (DIVERGENCES.md): no supplied-Content-Type inputs
(pure content sniff), no MP4 box walk or WebM/EBML parse, and the tag
table carries the common HTML tags (doctype, html/head/body/script/
iframe/title/div/p/h1/br/b/a + comment) — each extra tag is one more
row in ``_TAG_PATTERNS``.

Spark shape — ENTIRELY pure Column expressions, zero Python in the
data path: the payload's first ``_SCAN_BYTES`` bytes are projected to
ONE uppercase hex string (2 chars/byte keeps the alignment invariant:
a regex that consumes hex pairs can never match mid-byte), and the
whole WHATWG decision chain becomes a single CASE over anchored
``rlike``s on that string — whole-stage codegen, no UDF, no shuffle.
The same pattern constants are rendered into DuckDB SQL by
``oracle_case_sql`` so the registry oracle is a second ENGINE
(RE2 + DuckDB CASE) evaluating the identical decision chain, the
java.util.regex-vs-RE2 cross-check pattern proven by html_extract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: WHATWG "resource header": sniff at most this many leading bytes.
_SCAN_BYTES = 1445

#: WHATWG §7.1 binary data bytes: 0x00–0x08, 0x0B, 0x0E–0x1A, 0x1C–0x1F.
#: As hex pairs (the (..)* prefix keeps pair alignment).
_BINARY_BYTE_RE = r"^(?:[0-9A-F]{2})*(?:0[0-8BEF]|1[0-9ACDEF])"

#: tag-terminating byte (0x20 space or 0x3E '>') as a hex-pair regex.
_TT = "(?:20|3E)"

#: leading-whitespace run (0x09 0x0A 0x0C 0x0D 0x20), pair-aligned.
_WS = "(?:09|0A|0C|0D|20)*"


def _hex_ci(s: str) -> str:
    """Case-insensitive ASCII string as a hex-pair regex alternation."""
    out = []
    for ch in s:
        lo, up = ch.lower(), ch.upper()
        if lo != up:
            out.append("(?:%02X|%02X)" % (ord(up), ord(lo)))
        else:
            out.append("%02X" % ord(ch))
    return "".join(out)


def _hex_lit(b: bytes) -> str:
    return b.hex().upper()


#: exact-prefix signatures, WHATWG §6.1/6.2 order (images, then
#: audio/video, then archives/documents). First match wins.
_SIGNATURES: list[tuple[str, str]] = [
    (_hex_lit(b"GIF87a"), "image/gif"),
    (_hex_lit(b"GIF89a"), "image/gif"),
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    (_hex_lit(b"BM"), "image/bmp"),
    (_hex_lit(b"RIFF") + "(?:[0-9A-F]{8})" + _hex_lit(b"WEBPVP"), "image/webp"),
    (_hex_lit(b"fLaC"), "audio/flac"),
    (_hex_lit(b"RIFF") + "(?:[0-9A-F]{8})" + _hex_lit(b"WAVE"), "audio/wave"),
    (_hex_lit(b"ID3"), "audio/mpeg"),
    ("FFF[B32]", "audio/mpeg"),  # frame-sync forms FFFB/FFF3/FFF2
    (_hex_lit(b"OggS") + "00", "application/ogg"),
    (_hex_lit(b"RIFF") + "(?:[0-9A-F]{8})" + _hex_lit(b"AVI "), "video/avi"),
    (_hex_lit(b"FORM") + "(?:[0-9A-F]{8})" + _hex_lit(b"AIFF"), "audio/aiff"),
    (_hex_lit(b".snd"), "audio/basic"),
    ("1F8B08", "application/x-gzip"),
    (_hex_lit(b"PK") + "0304", "application/zip"),
    (_hex_lit(b"%PDF-"), "application/pdf"),
    (_hex_lit(b"%!PS-Adobe-"), "application/postscript"),
    ("0061736D", "application/wasm"),
]

#: case-insensitive tag patterns after optional whitespace; each must
#: be followed by a tag-terminating byte (WHATWG §6.1 row semantics).
_TAG_PATTERNS: list[tuple[str, str]] = [
    (_hex_ci("<!DOCTYPE HTML") + _TT, "text/html"),
    (_hex_ci("<HTML") + _TT, "text/html"),
    (_hex_ci("<HEAD") + _TT, "text/html"),
    (_hex_ci("<SCRIPT") + _TT, "text/html"),
    (_hex_ci("<IFRAME") + _TT, "text/html"),
    (_hex_ci("<H1") + _TT, "text/html"),
    (_hex_ci("<DIV") + _TT, "text/html"),
    (_hex_ci("<FONT") + _TT, "text/html"),
    (_hex_ci("<TABLE") + _TT, "text/html"),
    (_hex_ci("<A") + _TT, "text/html"),
    (_hex_ci("<STYLE") + _TT, "text/html"),
    (_hex_ci("<TITLE") + _TT, "text/html"),
    (_hex_ci("<B") + _TT, "text/html"),
    (_hex_ci("<BODY") + _TT, "text/html"),
    (_hex_ci("<BR") + _TT, "text/html"),
    (_hex_ci("<P") + _TT, "text/html"),
    (_hex_lit(b"<!--") + _TT, "text/html"),
    (_hex_ci("<?xml"), "text/xml"),  # WHATWG: no TT requirement
]

#: byte-order marks → text/plain (WHATWG §7.1 step 4).
_BOM_PATTERNS: list[tuple[str, str]] = [
    ("EFBBBF", "text/plain"),
    ("FEFF", "text/plain"),
    ("FFFE", "text/plain"),
]


def _ordered_rules() -> list[tuple[str, str]]:
    """(anchored hex regex, mime) in decision order: BOMs, exact
    signatures, whitespace-skipped tag patterns."""
    rules = [("^" + p, m) for p, m in _BOM_PATTERNS]
    rules += [("^" + p, m) for p, m in _SIGNATURES]
    rules += [("^" + _WS + p, m) for p, m in _TAG_PATTERNS]
    return rules


def sniff_mime(payload: Column) -> Column:
    """WHATWG-sniffed MIME type of a binary column, as one CASE over
    anchored regexes on the hex projection of the first 1445 bytes.
    Falls through to the §7.1 binary-byte heuristic: any binary data
    byte ⇒ application/octet-stream, else text/plain."""
    h = F.hex(F.substring(payload, 1, _SCAN_BYTES))
    expr = None
    for pat, mime in _ordered_rules():
        cond = h.rlike(pat)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    return F.when(payload.isNull(), F.lit(None).cast("string")).otherwise(
        expr.when(h.rlike(_BINARY_BYTE_RE), "application/octet-stream").otherwise(
            "text/plain"
        )
    )


def oracle_case_sql(hex_expr: str) -> str:
    """The identical decision chain as a DuckDB CASE over ``hex_expr``
    (an UPPERCASE hex-string SQL expression) — rendered from the same
    pattern constants so the two engines can never drift apart. Scope:
    non-NULL payloads (the Spark side returns NULL for a NULL payload
    before this chain runs; SQL callers guard NULLs themselves)."""
    lines = ["CASE"]
    for pat, mime in _ordered_rules():
        lines.append(f"  WHEN regexp_matches({hex_expr}, '{pat}') THEN '{mime}'")
    lines.append(
        f"  WHEN regexp_matches({hex_expr}, '{_BINARY_BYTE_RE}')"
        f" THEN 'application/octet-stream'"
    )
    lines.append("  ELSE 'text/plain'")
    lines.append("END")
    return "\n".join(lines)


# --- MP4 / WebM container sniff (WHATWG §6.2.1-6.2.2) -------------------------
#
# These two signatures need LENGTH ARITHMETIC (an ISO-BMFF box-size walk
# and an EBML vint parse), which a prefix regex cannot express — this is
# the mapInPandas composition path the round-6 module docstring named.
# Run it as a REFINEMENT stage on payloads the pure-Column sniff routed
# to application/octet-stream: signatures cheap enough to keep the fast
# path JVM-side, and the Python walk touches only the residue.


def matches_mp4(data: bytes) -> bool:
    """WHATWG §6.2.1 'matches the signature for MP4' — box-size walk
    over the ftyp box: u32BE size (multiple of 4, within the payload),
    'ftyp' tag, then the major brand and each 4-byte compatible brand
    compared against 'mp4'."""
    if len(data) < 12:
        return False
    box_size = int.from_bytes(data[0:4], "big")
    if len(data) < box_size or box_size % 4 != 0:
        return False
    if data[4:8] != b"ftyp":
        return False
    if data[8:11] == b"mp4":
        return True
    offset = 16  # skip the 4-byte minor version
    while offset + 3 <= box_size:
        if data[offset : offset + 3] == b"mp4":
            return True
        offset += 4
    return False


def _ebml_vint(data: bytes, pos: int) -> tuple[int, int]:
    """EBML variable-size integer at ``pos`` → (value, next pos); the
    leading byte's highest set bit gives the width, and the marker bit
    is masked out of the value."""
    if pos >= len(data):
        raise ValueError("ebml: vint at end of input")
    first = data[pos]
    if first == 0:
        raise ValueError("ebml: invalid all-zero vint marker")
    width = 8 - first.bit_length() + 1  # bytes including the marker byte
    if pos + width > len(data):
        raise ValueError("ebml: vint overruns input")
    value = first & ((1 << (8 - width)) - 1) if width <= 8 else 0
    for i in range(1, width):
        value = (value << 8) | data[pos + i]
    return value, pos + width


def matches_webm(data: bytes) -> bool:
    """WHATWG §6.2.2 'matches the signature for WebM': the EBML header
    id 1A45DFA3, then a bounded scan (38 bytes, per the spec) for the
    DocType element id 42 82 whose string payload is 'webm'."""
    if len(data) < 4 or data[0:4] != b"\x1a\x45\xdf\xa3":
        return False
    pos = 4
    limit = min(len(data), 38)
    while pos + 1 < limit:
        if data[pos] == 0x42 and data[pos + 1] == 0x82:
            pos += 2
            try:
                size, pos = _ebml_vint(data, pos)
            except ValueError:
                return False
            return data[pos : pos + size][:4] == b"webm"
        pos += 1
    return False


def container_mime(data: bytes) -> str | None:
    """The WHATWG container signatures the pure-Column sniff cannot
    express. Returns video/mp4, video/webm, or None (unrefined)."""
    if matches_mp4(data):
        return "video/mp4"
    if matches_webm(data):
        return "video/webm"
    return None


def refine_container_mime(df, mime_col: str = "mime", bytes_col: str = "payload"):
    """Refinement stage after :func:`sniff_mime`: rows the Column sniff
    left at application/octet-stream get the MP4 box walk / WebM EBML
    parse; everything else passes through untouched. mapInPandas over
    only (mime, bytes) — callers re-join wide columns, or select them
    through (they ride the Arrow batch unchanged)."""
    from typing import Iterator

    import pandas as pd

    schema = df.schema

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf[mime_col] == "application/octet-stream"
            if mask.any():
                pdf.loc[mask, mime_col] = [
                    container_mime(bytes(b)) or "application/octet-stream"
                    for b in pdf.loc[mask, bytes_col]
                ]
            yield pdf

    return df.mapInPandas(walk, schema)
