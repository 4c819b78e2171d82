"""Dependency-free WARC ingestion — the web-archive format (ISO 28500)
training-data crawls actually arrive in (Common Crawl ships WARC; the
reference pipeline's CSV ingest is the warehouse-side analogue,
``ETL/ETL.py:24-43``).

Three layers, mirroring the codec modules' posture:

* byte level — :func:`parse_warc` splits a ``.warc`` / ``.warc.gz`` blob
  into records by WARC header + ``Content-Length`` walk (never regex
  splitting, which corrupts on binary payloads containing header-like
  bytes); per-record gzip members (the spec's recommended compression —
  each record its own member) inflate with stdlib zlib.
  :func:`encode_warc` writes both forms — the deterministic fixture
  generator every decoder-path test round-trips through.
* payload level — :func:`parse_http_response` peels the HTTP envelope of
  ``response`` records (status, headers, body; ``Content-Encoding:
  gzip`` bodies inflate), and :func:`html_to_text` extracts visible text
  from HTML with the stdlib parser (script/style/template dropped,
  entities unescaped, block-level whitespace normalized) — the
  dependency-free counterpart of trafilatura-class extractors; quality
  scoring downstream (operators/textan) prunes what a smarter extractor
  would have.
* relation level — :func:`warc_records` explodes WARC blobs (one row per
  file, e.g. ``spark.read.format("binaryFile")``) into record rows, and
  :func:`warc_to_documents` lands ``response`` records as the engine's
  ``documents`` shape ``(doc_id, url, fetched_at, mime, text)`` — the
  entry point of the corpus pipeline (quality → dedup → tokenize).

Scale posture: the parallel unit is the WARC FILE (crawls ship thousands
of ~1 GB files — natural partitions; record-at-a-time gzip members mean
no file-internal parallelism is needed). Both operators are Arrow-batched
``mapInPandas``: bytes never reach the driver, output rows stream per
batch, and a malformed file yields its parseable prefix (corpus triage
keeps what decodes, like every codec here). doc_id is the xxhash64 of
(file, record offset) — deterministic, join-stable, collision-checked by
the dedup stage's content digests downstream.
"""

from __future__ import annotations

import io
import re
import zlib
from collections.abc import Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ship_by_value() -> None:
    """Worker closures call these module-level parsers; ship the module by
    value so executors never need the repo on sys.path (the
    operators/multimodal.py convention)."""
    import sys

    from pyspark.cloudpickle import register_pickle_by_value

    register_pickle_by_value(sys.modules[__name__])


# ---------------------------------------------------------------------------
# byte level
# ---------------------------------------------------------------------------

# Total inflated-output cap per decompression walk (gzip member loop AND
# the deflate content-coding path). Crawl data is adversarial: a 1 MiB
# deflate bomb inflates ~1000:1 and would balloon one executor without a
# bound. 64 MiB comfortably exceeds any real page body; a capped stream
# keeps the inflated prefix (triage, not failure) — pinned by
# tests/test_warc.py::test_inflate_output_is_bounded.
_MAX_INFLATE_BYTES = 1 << 26


def _gunzip_members(data: bytes, max_out: int = _MAX_INFLATE_BYTES) -> bytes:
    """Concatenate every gzip member of ``data`` (WARC's per-record
    compression writes one member per record; stdlib gzip.decompress stops
    after the first on some malformed tails — loop explicitly). A torn
    final member yields what inflated so far (triage, not failure).

    Feeds each member bounded CHUNKs through a memoryview: handing the
    whole remaining buffer to every member's decompressobj copies
    O(members x blob) bytes through slices and unused_data — quadratic on
    real crawl files with thousands of members (measured 1.6 MiB/s before;
    same failure class as the bigint bit-reader trap)."""
    out = bytearray()
    view = memoryview(data)
    pos = 0
    n = len(data)
    CHUNK = 1 << 18
    while pos < n and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        mpos = pos
        try:
            while not d.eof and mpos < n:
                budget = max_out - len(out)
                if budget <= 0:
                    return bytes(out)  # bomb guard: cap total output
                fed = view[mpos : mpos + CHUNK]
                out += d.decompress(fed, budget)
                if d.unconsumed_tail:
                    return bytes(out)  # cap reached mid-member
                mpos += len(fed)
        except zlib.error:
            return bytes(out)  # corrupt member: keep the inflated prefix
        if not d.eof:
            break  # truncated member: keep the prefix
        pos = mpos - len(d.unused_data)
    return bytes(out)


def _inflate(data: bytes, wbits: int, max_out: int) -> tuple[bytes, bool, bool]:
    """One bounded inflate attempt → ``(out, eof, error)``. Feeds bounded
    chunks so a corrupt stream keeps the bytes inflated BEFORE the bad
    code (a single ``decompress(body)`` discards them when it raises), and
    caps total output at ``max_out`` (deflate bombs). ``eof`` means the
    stream completed; ``error`` means zlib rejected the data mid-stream."""
    d = zlib.decompressobj(wbits=wbits)
    out = bytearray()
    view = memoryview(data)
    pos, n = 0, len(data)
    CHUNK = 1 << 18
    error = False
    capped = False
    try:
        while not d.eof and pos < n:
            budget = max_out - len(out)
            if budget <= 0:
                capped = True  # bomb guard: cap total output
                break
            fed = view[pos : pos + CHUNK]
            out += d.decompress(fed, budget)
            if d.unconsumed_tail:
                capped = True  # cap reached mid-chunk
                break
            pos += len(fed)
        if not d.eof and not capped:
            # truncated stream (input exhausted): flush what zlib still
            # buffers. Never flush after a cap break — flush() processes
            # ALL pending input with no length limit, defeating the cap.
            out += d.flush()
    except zlib.error:
        error = True
    return bytes(out[:max_out]), d.eof, error


def _parse_header_block(block: bytes) -> dict[str, str]:
    """WARC/HTTP header lines → dict (case-insensitive keys lowered;
    duplicate keys keep the first, matching lenient archive readers)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if not line or b":" not in line:
            continue
        k, _, v = line.partition(b":")
        key = k.strip().decode("latin-1").lower()
        if key not in headers:
            headers[key] = v.strip().decode("latin-1")
    return headers


def parse_warc(content: bytes) -> list[dict]:
    """Split a WARC blob into records:
    ``{"offset", "headers" (dict), "block" (bytes)}`` per record.

    Detects per-record-gzip blobs by magic and inflates first. Walks
    version line → header block → ``Content-Length`` bytes → CRLF CRLF
    separator; anything after a malformed boundary is dropped (the
    parseable prefix survives — truncated crawls are data)."""
    data = bytes(content)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data[pos : pos + 5].startswith(b"WARC/"):
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        first_nl = data.find(b"\r\n", pos, head_end)
        header_block = data[first_nl + 2 : head_end] if first_nl >= 0 else b""
        headers = _parse_header_block(header_block)
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        block_start = head_end + 4
        if block_start + length > n:
            break  # torn final record
        records.append(
            {
                "offset": pos,
                "headers": headers,
                "block": data[block_start : block_start + length],
            }
        )
        pos = block_start + length
        # spec: two CRLFs close a record; tolerate their absence at EOF
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
    return records


def encode_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Write WARC/1.0 bytes from record dicts ``{"warc_type", "uri",
    "date", "content_type", "block" (bytes), ...extra headers}`` — the
    deterministic fixture generator (no uuids, no clock: callers pass
    explicit dates/ids so round-trip tests and both engines see identical
    bytes). ``gzip_members=True`` writes one gzip member per record, the
    compression layout crawls ship."""
    out = bytearray()
    for i, rec in enumerate(records):
        block = bytes(rec.get("block", b""))
        lines = [b"WARC/1.0"]
        lines.append(b"WARC-Type: " + rec.get("warc_type", "resource").encode())
        if rec.get("uri"):
            lines.append(b"WARC-Target-URI: " + rec["uri"].encode())
        lines.append(
            b"WARC-Date: " + rec.get("date", "2024-01-01T00:00:00Z").encode()
        )
        lines.append(
            b"WARC-Record-ID: "
            + rec.get("record_id", f"<urn:fixture:{i}>").encode()
        )
        if rec.get("content_type"):
            lines.append(b"Content-Type: " + rec["content_type"].encode())
        lines.append(b"Content-Length: " + str(len(block)).encode())
        member = b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"
        if gzip_members:
            gz = io.BytesIO()
            # mtime=0: deterministic bytes (gzip stores a timestamp)
            import gzip as _gzip

            with _gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as f:
                f.write(member)
            out += gz.getvalue()
        else:
            out += member
    return bytes(out)


# ---------------------------------------------------------------------------
# payload level
# ---------------------------------------------------------------------------


def _dechunk(body: bytes) -> bytes:
    """Reassemble a ``Transfer-Encoding: chunked`` body (hex size line,
    CRLF, chunk bytes, CRLF, ... terminated by a 0-size chunk). Crawlers
    that store raw wire bytes (wget, Heritrix) keep the chunk framing in
    the WARC block; without de-chunking the hex size lines leak into the
    extracted text. A malformed frame keeps the chunks assembled so far
    (triage, not failure)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        line_end = body.find(b"\r\n", pos)
        if line_end < 0:
            break
        # chunk extensions (";ext=val") are legal after the size
        size_token = body[pos:line_end].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            break
        if size == 0:
            pos = line_end + 2  # trailer section (if any) is dropped
            break
        start = line_end + 2
        if start + size > n:
            out += body[start:n]  # torn final chunk: keep the prefix
            break
        out += body[start : start + size]
        pos = start + size + 2  # skip the chunk-data CRLF
    return bytes(out)


def parse_http_response(block: bytes) -> dict:
    """HTTP envelope of a WARC ``response`` record → ``{"status",
    "headers", "body" (bytes)}``. ``Transfer-Encoding: chunked`` framing
    is reassembled (raw-wire captures keep it), then ``Content-Encoding:
    gzip`` bodies inflate; unknown encodings pass through raw (triage
    downstream)."""
    head_end = block.find(b"\r\n\r\n")
    if head_end < 0 or not block[:5] in (b"HTTP/",):
        return {"status": None, "headers": {}, "body": block}
    status_line = block[: block.find(b"\r\n")]
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    headers = _parse_header_block(block[len(status_line) + 2 : head_end])
    body = block[head_end + 4 :]
    # transfer-coding wraps content-coding on the wire: de-chunk first
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body) or body
    coding = headers.get("content-encoding", "").lower().strip()
    if coding in ("gzip", "x-gzip"):  # x-gzip: the HTTP/1.1 legacy alias
        try:
            body = _gunzip_members(body) or body
        except Exception:
            pass
    elif coding == "deflate":
        # servers ship BOTH meanings of 'deflate' (zlib-wrapped per the
        # RFC, raw-deflate per the bug everyone copied) — try zlib first,
        # fall back to raw. The zlib attempt wins only when its stream
        # COMPLETED (eof) or inflated cleanly to end of input: a raw body
        # whose first two bytes fake a zlib header must not 'succeed'
        # with a garbage prefix. Output is capped at _MAX_INFLATE_BYTES
        # (bomb guard); a torn or capped stream keeps the inflated
        # prefix via the chunked _inflate walk.
        zout, zeof, zerr = _inflate(body, zlib.MAX_WBITS, _MAX_INFLATE_BYTES)
        if zeof and not zerr:
            body = zout or body  # complete zlib stream: the RFC meaning
        else:
            rout, reof, rerr = _inflate(
                body, -zlib.MAX_WBITS, _MAX_INFLATE_BYTES
            )
            if reof and not rerr:
                body = rout or body  # complete raw stream beats a partial
            elif zout and not zerr:
                body = zout  # torn zlib stream: keep the inflated prefix
            elif rout and not rerr:
                body = rout  # torn raw stream: keep the inflated prefix
            # both attempts rejected the data: pass the bytes through raw
    return {"status": status, "headers": headers, "body": body}


class _TextParser(HTMLParser):
    """Stdlib HTMLParser walk: visible text only — script/style/template/
    noscript subtrees dropped, block-level elements become newlines,
    entities unescape (HTMLParser does it with convert_charrefs).
    Module-level class: the per-document cost is one instantiation, not a
    fresh ``class`` statement (this module ships by value, so executors
    see it without sys.path)."""

    _SKIP = {"script", "style", "template", "noscript", "svg", "head"}
    _BLOCK = {
        "p", "div", "br", "li", "ul", "ol", "table", "tr", "h1", "h2",
        "h3", "h4", "h5", "h6", "section", "article", "header", "footer",
        "blockquote", "pre", "hr",
    }

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self.depth += 1
        elif tag in self._BLOCK and not self.depth:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in self._SKIP and self.depth:
            self.depth -= 1
        elif tag in self._BLOCK and not self.depth:
            self.parts.append("\n")

    def handle_data(self, d):
        if not self.depth and d:
            self.parts.append(d)


def html_to_text(html: str) -> str:
    """Visible text of an HTML document (stdlib parser; tolerant of tag
    soup the way real crawl HTML demands). One newline per block element,
    inline whitespace collapsed."""
    p = _TextParser()
    p.feed(html)
    p.close()
    lines = [" ".join(seg.split()) for seg in "".join(p.parts).split("\n")]
    return "\n".join(ln for ln in lines if ln)


def _charset_of(content_type: str) -> str | None:
    """Charset declared in a Content-Type header, or None (the common
    crawl case — servers often omit it and declare only in the HTML)."""
    for part in content_type.split(";"):
        part = part.strip()
        if part.lower().startswith("charset="):
            return part[8:].strip().strip('"') or None
    return None


# the HTML5 prescan convention: sniff only the first 1 KiB for a meta
# charset declaration (covers both <meta charset=x> and the legacy
# <meta http-equiv=Content-Type content="...;charset=x"> spelling)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-]{1,40})",
    re.IGNORECASE,
)


def _sniff_charset(body: bytes) -> str | None:
    """Charset evidence from the BYTES when the header declares none:
    a BOM (decisive), else an HTML5-prescan meta declaration in the
    first 1 KiB. A windows-1252 or shift_jis page that declares itself
    only in <meta> — the normal case on the real web — would otherwise
    mojibake under the utf-8 default and be thrown away by quality
    scoring downstream."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"  # decode strips the BOM character
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"  # stdlib honors the BOM for byte order
    m = _META_CHARSET_RE.search(body[:1024])
    if m:
        return m.group(1).decode("ascii", "replace")
    return None


def _decode_body(body: bytes, content_type: str) -> str:
    """Decode an HTTP body by its declared charset — header first, then
    BOM / HTML5 meta prescan, then utf-8 — lenient on both axes:
    undecodable BYTES are replaced, and an UNKNOWN charset at any step
    falls through to the next (a bogus header charset still consults the
    page's own BOM/<meta> evidence before the utf-8 last resort; crawl
    servers declare 'bogus-enc' often enough that one page must never
    kill a task)."""
    declared = _charset_of(content_type)
    if declared:
        try:
            return body.decode(declared, errors="replace")
        except LookupError:
            pass  # bogus header charset: fall through to byte evidence
    sniffed = _sniff_charset(body)
    if sniffed:
        try:
            return body.decode(sniffed, errors="replace")
        except LookupError:
            pass  # bogus <meta charset> too: last resort below
    return body.decode("utf-8", errors="replace")


# ---------------------------------------------------------------------------
# relation level
# ---------------------------------------------------------------------------

# mimes whose payload is an HTML document (visible-text extraction + link
# walk apply): text/html plus the XHTML registration real servers use
_HTML_MIMES = {"text/html", "application/xhtml+xml"}

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_offset", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("block", T.BinaryType()),
    ]
)

WARC_DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("fetched_at", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def warc_records(
    files: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Explode WARC file blobs (``spark.read.format("binaryFile")`` rows)
    into one row per record. Arrow-batched ``mapInPandas``; per-file work
    is one linear walk; malformed tails keep their parseable prefix."""
    import pandas as pd

    _ship_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in WARC_RECORD_SCHEMA}
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for rec in parse_warc(bytes(content)):
                    h = rec["headers"]
                    out["warc_file"].append(path)
                    out["record_offset"].append(rec["offset"])
                    out["warc_type"].append(h.get("warc-type", ""))
                    out["url"].append(h.get("warc-target-uri"))
                    out["warc_date"].append(h.get("warc-date"))
                    out["content_type"].append(h.get("content-type"))
                    out["block"].append(rec["block"])
            yield pd.DataFrame(out)

    return files.select(path_col, content_col).mapInPandas(
        run, WARC_RECORD_SCHEMA
    )


def warc_to_documents(
    files: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    min_status: int = 200,
    max_status: int = 299,
) -> DataFrame:
    """WARC file blobs → the engine's document relation ``(doc_id, url,
    fetched_at, http_status, mime, text)``: ``response`` records with a
    2xx status, HTML payloads reduced to visible text
    (:func:`html_to_text`), ``text/*`` payloads decoded by declared
    charset (lenient: undecodable bytes replaced — quality scoring
    downstream prunes mojibake), everything else skipped (images/audio
    belong in the media table, see operators/multimodal). ``doc_id`` is
    ``xxhash64(file, offset)`` — deterministic and join-stable across
    re-reads of the same crawl.

    ONE fused ``mapInPandas`` stage per file (parse -> HTTP peel -> text
    extract, no intermediate record relation): chaining through
    :func:`warc_records` Arrow-round-trips every raw payload block
    between two Python stages — measured 6.1 s vs the fused form on a
    94 MiB probe where the pure parse CPU is ~0.3 s. Use
    :func:`warc_records` when the record relation itself is the
    product."""
    _ship_by_value()
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in WARC_DOCUMENT_SCHEMA}
            files_, offs = [], []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for rec in parse_warc(bytes(content)):
                    if rec["headers"].get("warc-type") != "response":
                        continue
                    http = parse_http_response(rec["block"])
                    status = http["status"]
                    if status is None or not (
                        min_status <= status <= max_status
                    ):
                        continue
                    ctype = http["headers"].get("content-type", "")
                    mime = ctype.split(";")[0].strip().lower()
                    # XHTML ships as application/xhtml+xml on the real
                    # web — it is an HTML document, not a skip
                    is_html = mime in _HTML_MIMES
                    if not (mime.startswith("text/") or is_html):
                        continue
                    raw = _decode_body(http["body"], ctype)
                    out["doc_id"].append(0)
                    out["url"].append(rec["headers"].get("warc-target-uri"))
                    out["fetched_at"].append(rec["headers"].get("warc-date"))
                    out["http_status"].append(status)
                    out["mime"].append(mime)
                    out["text"].append(
                        html_to_text(raw) if is_html else raw
                    )
                    files_.append(path)
                    offs.append(rec["offset"])
            df = pd.DataFrame(out)
            df["__file"], df["__off"] = files_, offs
            yield df

    with_src = files.select(path_col, content_col).mapInPandas(
        run,
        T.StructType(
            list(WARC_DOCUMENT_SCHEMA)
            + [
                T.StructField("__file", T.StringType()),
                T.StructField("__off", T.LongType()),
            ]
        ),
    )
    return with_src.select(
        F.xxhash64("__file", "__off").alias("doc_id"),
        "url",
        "fetched_at",
        "http_status",
        "mime",
        "text",
    )


class _LinkParser(HTMLParser):
    """Stdlib HTMLParser walk collecting ``<a href>`` targets — the raw
    edge list of the crawl link graph. Module-level class (same reason as
    :class:`_TextParser`)."""

    def __init__(self):
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag != "a":
            return
        for k, v in attrs:
            if k == "href" and v:
                self.hrefs.append(v)


def _extract_links(base_url: str, html: str) -> list[str]:
    """``<a href>`` targets of a page, resolved absolute against the page
    URL (urljoin), fragments dropped, http(s) schemes only."""
    from urllib.parse import urldefrag, urljoin, urlsplit

    p = _LinkParser()
    p.feed(html)
    p.close()
    out = []
    for href in p.hrefs:
        try:
            # fragments never name a distinct resource: defrag so
            # #section links collapse onto the page URL
            absolute = urldefrag(urljoin(base_url or "", href)).url
            scheme = urlsplit(absolute).scheme
        except ValueError:
            continue  # crawl HTML contains unparseable href soup
        if scheme in ("http", "https"):
            out.append(absolute)
    return out


WARC_LINK_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType()),
        T.StructField("dst_url", T.StringType()),
    ]
)


def warc_to_links(
    files: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """WARC file blobs → the crawl LINK GRAPH ``(src_url, dst_url)``: one
    edge per ``<a href>`` of every 2xx HTML response, targets resolved
    absolute against the page URL. The host-level rollup of this relation
    (:func:`host_link_graph`) feeds ``operators.graph.pagerank`` — the
    domain-authority weighting corpus-quality pipelines mix into
    sampling. Fused single ``mapInPandas`` stage, file-partitioned, no
    shuffle (the rollup adds the only exchange)."""
    _ship_by_value()
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src, dst = [], []
            for _path, content in zip(pdf[path_col], pdf[content_col]):
                for rec in parse_warc(bytes(content)):
                    if rec["headers"].get("warc-type") != "response":
                        continue
                    url = rec["headers"].get("warc-target-uri") or ""
                    http = parse_http_response(rec["block"])
                    status = http["status"]
                    if status is None or not (200 <= status <= 299):
                        continue
                    ctype = http["headers"].get("content-type", "")
                    if ctype.split(";")[0].strip().lower() not in _HTML_MIMES:
                        continue
                    raw = _decode_body(http["body"], ctype)
                    for target in _extract_links(url, raw):
                        src.append(url)
                        dst.append(target)
            yield pd.DataFrame({"src_url": src, "dst_url": dst})

    return files.select(path_col, content_col).mapInPandas(
        run, WARC_LINK_SCHEMA
    )


def host_link_graph(links: DataFrame) -> DataFrame:
    """URL edges → weighted host edges ``(src_host, dst_host, n_links)``,
    self-loops dropped: the relation domain-authority ranking runs over
    (``operators.graph.pagerank``). Pure Catalyst — ``parse_url`` is
    JVM-side — with one hash-agg exchange keyed on the host pair."""
    from data_etl_with_dbt_spark.functions.web import url_host

    src_host = url_host("src_url")
    dst_host = url_host("dst_url")
    return (
        links.select(src_host.alias("src_host"), dst_host.alias("dst_host"))
        .where(
            F.col("src_host").isNotNull()
            & F.col("dst_host").isNotNull()
            & (F.col("src_host") != F.col("dst_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_links"))
    )
