"""WARC source: read Common-Crawl-style WARC files into the pages schema.

WARC (ISO 28500, public spec) is the container Common Crawl ships —
response records carry the fetched HTTP payload. This reader turns a
directory of ``.warc`` / ``.warc.gz`` files into a Dataset shaped like
the repo's pages tables: ``(url, warc_ts, html, http_status,
content_type)``.

Scale shape: parallelism is per FILE (the real CC layout is ~10⁵ WARC
files of ~1 GB — file-level sharding saturates any cluster), via
``ray.data.read_binary_files`` → one parse task per file. Record
parsing is sequential WITHIN a file by format necessity (records are
length-delimited, and CC gzip members are concatenated), so the
per-record Python here is the I/O-bound file scan every WARC consumer
performs, not a per-row hot loop over columnar data. Malformed records
follow the JSONL readers' policy family: lenient skip (default) or
strict raise.

The tiny writer exists for fixtures and interop tests (round-trip
through the real byte format, not a mock).
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _parse_warc_date(s: str) -> int:
    """WARC-Date (ISO 8601, UTC 'Z', optional fractional seconds per
    WARC 1.1) → epoch microseconds."""
    s = s.strip()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.strptime(s, fmt)
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


def parse_warc_bytes(data: bytes, strict: bool = False) -> list[dict]:
    """Parse one WARC file's bytes → list of response-record dicts
    ``{url, warc_ts, html, http_status, content_type}``. Non-response
    records (warcinfo, request, metadata) are skipped; malformed
    records are skipped (lenient) or raise ValueError (strict)."""
    if data[:2] == b"\x1f\x8b":  # gzip (CC ships member-concatenated .gz)
        data = gzip.decompress(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            if strict:
                raise ValueError("WARC: truncated record header")
            break
        head = data[pos:hdr_end]
        if not head.startswith(b"WARC/"):
            if strict:
                raise ValueError("WARC: missing version line")
            # resync: skip to next blank line
            pos = hdr_end + 4
            continue
        fields: dict[str, str] = {}
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                fields[k.decode("latin-1").strip().lower()] = v.decode(
                    "latin-1"
                ).strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError("WARC: bad/missing Content-Length") from None
            pos = hdr_end + 4
            continue
        body = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        try:
            ts = _parse_warc_date(fields.get("warc-date", ""))
        except ValueError:
            if strict:
                raise
            continue
        # HTTP payload: status line + headers, blank line, entity body
        http_end = body.find(_CRLF2)
        status = 0
        ctype = ""
        html = b""
        if http_end >= 0:
            http_head = body[:http_end]
            html = body[http_end + 4 :]
            lines = http_head.split(b"\r\n")
            first = lines[0].split()
            if len(first) >= 2 and first[0].startswith(b"HTTP/"):
                try:
                    status = int(first[1])
                except ValueError:
                    status = 0
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                if _ and k.decode("latin-1").strip().lower() == "content-type":
                    ctype = v.decode("latin-1").strip()
        elif strict:
            raise ValueError("WARC: response record without HTTP payload")
        out.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "http_status": status,
                "content_type": ctype,
            }
        )
    return out


def read_warc(paths, strict: bool = False, **read_kwargs):
    """Directory/list of ``.warc``/``.warc.gz`` files → Dataset
    ``(url, warc_ts, html, http_status, content_type)``. One parse task
    per file; see module docstring for the scale rationale."""
    import ray

    files = ray.data.read_binary_files(paths, **read_kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for payload in batch["bytes"].to_pylist():
            rows.extend(parse_warc_bytes(payload, strict=strict))
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [r["warc_ts"] for r in rows], pa.timestamp("us")
                ),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "http_status": pa.array(
                    [r["http_status"] for r in rows], pa.int32()
                ),
                "content_type": pa.array(
                    [r["content_type"] for r in rows], pa.string()
                ),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def write_warc_file(path: str, pages: list[dict], compress: bool = False) -> None:
    """Write pages ``{url, warc_ts(us), html(bytes)}`` as a real WARC
    file (response records with an HTTP/1.1 200 payload). Fixture/
    interop helper — deterministic output for byte-level tests."""
    chunks: list[bytes] = []
    for p in pages:
        ts_us = int(p["warc_ts"])
        base = datetime.fromtimestamp(ts_us // 1_000_000, tz=timezone.utc)
        micros = ts_us % 1_000_000
        # WARC 1.1 fractional seconds only when needed, so whole-second
        # records stay byte-identical to WARC 1.0 consumers' expectations
        dt = base.strftime("%Y-%m-%dT%H:%M:%S") + (
            f".{micros:06d}Z" if micros else "Z"
        )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + p["html"]
        )
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {p['url']}\r\n"
            f"WARC-Date: {dt}\r\n"
            f"Content-Length: {len(http)}\r\n"
            f"Content-Type: application/http;msgtype=response\r\n"
        ).encode()
        chunks.append(head + b"\r\n" + http + b"\r\n\r\n")
    blob = b"".join(chunks)
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)
