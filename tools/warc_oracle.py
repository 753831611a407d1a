#!/usr/bin/env python3
"""Independent WARC re-decode (CPython stdlib only — gzip + the ISO 28500
record grammar, no Spark, no graft code, no warcio): parses every fixture
file, recomputes the warc_fixture_scan aggregate from the BYTES, and
compares it against the same closed-form formulas the DuckDB oracle uses.
The tarfile-interop pattern applied to the crawl format.

Usage: warc_oracle.py <fixtureDir> <nPages>
       warc_oracle.py ce <fixtureDir> <nPages>   # Content-Encoding fixture
"""
import sys, os, gzip, io, hashlib, zlib


def read_line(f):
    """One CRLF line, decoded latin-1; '' only for a bare empty line."""
    buf = bytearray()
    while True:
        c = f.read(1)
        if not c:
            return None if not buf else buf.decode("latin-1")
        if c == b"\n":
            break
        buf += c
    if buf.endswith(b"\r"):
        del buf[-1]
    return buf.decode("latin-1")


def records(f, fname):
    """Yield (fields_dict, block_bytes) per record; strict framing."""
    while True:
        line = read_line(f)
        while line == "":
            line = read_line(f)
        if line is None:
            return
        assert line.startswith("WARC/"), (fname, line[:40])
        fields = {}
        while True:
            line = read_line(f)
            assert line is not None, (fname, "truncated header")
            if line == "":
                break
            if line[0] in " \t":
                continue  # folded continuation: not used by the fixture
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        n = int(fields["content-length"])
        block = f.read(n)
        assert len(block) == n, (fname, "truncated block")
        yield fields, block


def http_split(block):
    """(status:int|None, content_type:str|None, body:bytes)."""
    head, sep, body = block.partition(b"\r\n\r\n")
    assert sep, "HTTP block without header terminator"
    lines = head.decode("latin-1").split("\r\n")
    status = None
    if lines[0].startswith("HTTP/"):
        parts = lines[0].split(" ")
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    ctype = None
    for h in lines[1:]:
        k, _, v = h.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, body


def main(fixture_dir, n_pages):
    # ---- re-decode the actual bytes -----------------------------------
    agg = {}  # rec_type -> [n, n_ok, payload_bytes]
    seen_urls = set()
    md5s = {}
    for name in sorted(os.listdir(fixture_dir)):
        if name.startswith("_") or name.startswith("."):
            continue
        path = os.path.join(fixture_dir, name)
        raw = open(path, "rb").read()
        if name.endswith(".gz"):
            # concatenated member-per-record gzip: stdlib gzip.decompress
            # handles multi-member streams
            data = gzip.decompress(raw)
        else:
            data = raw
        for fields, block in records(io.BytesIO(data), name):
            t = fields["warc-type"]
            a = agg.setdefault(t, [0, 0, 0])
            a[0] += 1
            if fields.get("content-type", "").startswith("application/http"):
                status, ctype, body = http_split(block)
            else:
                status, ctype, body = None, None, block
            if status == 200:
                a[1] += 1
            a[2] += len(body)
            if t == "response":
                seen_urls.add(fields["warc-target-uri"])
                md5s[fields["warc-target-uri"]] = hashlib.md5(body).hexdigest()

    # ---- the same closed-form formulas the DuckDB oracle uses ---------
    exp = {"warcinfo": [4, 0, 0], "request": [n_pages, 0, 0],
           "response": [n_pages, 0, 0]}
    for f in range(4):
        exp["warcinfo"][2] += (len("software: graft-warc-synth") + 2 +
                               len("isPartOf: graft-fixture-file-%d" % f) + 2)
    for i in range(n_pages):
        g = i % 700
        status = 404 if i % 17 == 0 else 200
        if status == 200:
            exp["response"][1] += 1
        if i % 13 == 5:
            plen = 26 + i % 30
        else:
            plen = len("<html><title>t%d</title><body>warc document %d "
                       "alpha beta gamma %d</body></html>"
                       % (g, g, (g * 37) % 1000))
        exp["response"][2] += plen

    ok = True
    for t in sorted(set(agg) | set(exp)):
        got, want = agg.get(t), exp.get(t)
        tag = "OK " if got == want else "FAIL"
        if got != want:
            ok = False
        print("%s %-9s got=%s want=%s" % (tag, t, got, want))
    assert len(seen_urls) == n_pages, (len(seen_urls), n_pages)
    # spot-check one md5 against the formula-derived html
    i = 42
    g = i % 700
    html = ("<html><title>t%d</title><body>warc document %d alpha beta "
            "gamma %d</body></html>" % (g, g, (g * 37) % 1000))
    assert md5s["http://site%d.example/p%d" % (i % 50, i)] == \
        hashlib.md5(html.encode()).hexdigest(), "payload md5 mismatch"
    print("WARC_ORACLE %s (%d urls)" % ("PASS" if ok else "FAIL",
                                        len(seen_urls)))
    sys.exit(0 if ok else 1)


def dechunk(body):
    """RFC 9112 chunked-transfer reframe, strict."""
    out, p = bytearray(), 0
    while True:
        e = body.index(b"\r\n", p)
        size = int(body[p:e].split(b";")[0], 16)
        p = e + 2
        if size == 0:
            break
        out += body[p:p + size]
        p += size
        assert body[p:p + 2] == b"\r\n", "missing CRLF after chunk"
        p += 2
    return bytes(out)


def main_ce(fixture_dir, n_pages):
    """Independent re-decode of the Content-Encoding fixture: stdlib
    gzip/zlib against the closed-form page formulas. Pages cycle
    gzip / zlib-deflate / gzip-under-chunked / raw-deflate by i % 4."""
    got = {}
    for name in sorted(os.listdir(fixture_dir)):
        if name.startswith("_") or name.startswith("."):
            continue
        path = os.path.join(fixture_dir, name)
        raw = open(path, "rb").read()
        data = gzip.decompress(raw) if name.endswith(".gz") else raw
        for fields, block in records(io.BytesIO(data), name):
            if fields["warc-type"] != "response":
                continue
            head, _, body = block.partition(b"\r\n\r\n")
            hdrs = {}
            for h in head.decode("latin-1").split("\r\n")[1:]:
                k, _, v = h.partition(":")
                hdrs[k.strip().lower()] = v.strip()
            if "chunked" in hdrs.get("transfer-encoding", ""):
                body = dechunk(body)
            enc = hdrs.get("content-encoding")
            if enc == "gzip":
                body = gzip.decompress(body)
            elif enc == "deflate":
                # zlib-vs-raw sniff, like every real HTTP client
                try:
                    body = zlib.decompress(body)
                except zlib.error:
                    body = zlib.decompress(body, -15)
            got[fields["warc-target-uri"]] = body
    ok = True
    for i in range(n_pages):
        g = i % 700
        html = ("<html><title>t%d</title><body>warc document %d alpha "
                "beta gamma %d</body></html>" % (g, g, (g * 37) % 1000))
        url = "http://site%d.example/p%d" % (i % 50, i)
        if got.get(url) != html.encode():
            ok = False
            print("FAIL page %d: %r" % (i, got.get(url, b"")[:60]))
    print("WARC_ORACLE %s (%d pages, content-encoding re-decode)"
          % ("PASS" if ok else "FAIL", len(got)))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if sys.argv[1] == "ce":
        main_ce(sys.argv[2], int(sys.argv[3]))
    else:
        main(sys.argv[1], int(sys.argv[2]))
