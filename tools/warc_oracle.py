#!/usr/bin/env python3
"""Independent WARC re-decode (CPython stdlib only — gzip + the ISO 28500
record grammar, no Spark, no graft code, no warcio): parses every fixture
file, recomputes the warc_fixture_scan aggregate from the BYTES, and
compares it against the same closed-form formulas the DuckDB oracle uses.
The tarfile-interop pattern applied to the crawl format.

Usage: warc_oracle.py <fixtureDir> <nPages>
       warc_oracle.py ce <fixtureDir> <nPages>   # Content-Encoding fixture
       warc_oracle.py cdxj <dir>  # write index.cdxj for every .warc.gz
       warc_oracle.py cdxj-check <dir>  # validate engine-exported .cdxj twins
"""
import sys, os, gzip, io, hashlib, zlib, json, struct


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


def brotli_uncompressed(data):
    """Decode the fixture's brotli shape: an optional leading
    COMPRESSED metablock carrying the fixed §8 static-dictionary
    reference (word 0 through Appendix B transform 4 -> b"Time "; the
    field-by-field bit layout is asserted below, so a drifted encoder
    fails loudly), followed by uncompressed metablocks (RFC 7932 §9.2:
    WBITS, then per metablock ISLAST/[ISLASTEMPTY]/MNIBBLES/MLEN/
    [ISUNCOMPRESSED], byte-aligned raw bytes). Full compressed-stream
    independence lives elsewhere: BrotliDictSpec round-trips 80
    brotlicffi-encoded fixtures; this keeps the CE oracle
    stdlib-only."""
    pos = 0  # bit position

    def bits(n):
        nonlocal pos
        v = 0
        for i in range(n):
            v |= ((data[pos >> 3] >> (pos & 7)) & 1) << i
            pos += 1
        return v

    # WBITS
    if bits(1) == 1:
        n = bits(3)
        if n == 0:
            assert bits(3) != 1
    out = bytearray()
    while True:
        islast = bits(1)
        if islast and bits(1):
            break  # ISLASTEMPTY
        mn = bits(2)
        assert mn != 3, "metadata blocks not expected in the fixture"
        mlen = bits(4 * (4 + mn)) + 1
        if islast or bits(1) != 1:
            # compressed metablock: must be the fixed dict-ref wire
            assert not islast and mlen == 5, "unexpected compressed block"
            assert bits(3) == 0          # NBLTYPES L/I/D = 1
            assert bits(2) == 0          # NPOSTFIX
            assert bits(4) == 0          # NDIRECT
            assert bits(2) == 0          # context mode LSB6
            assert bits(2) == 0          # NTREESL=1, NTREESD=1
            assert bits(2) == 1 and bits(2) == 0   # literal: simple, 1 sym
            bits(8)                                # the unused literal
            assert bits(2) == 1 and bits(2) == 0   # command: simple, 1 sym
            assert bits(10) == 130       # insert 0, copy 4, explicit dist
            assert bits(2) == 1 and bits(2) == 0   # distance: simple, 1 sym
            assert bits(6) == 36         # offset 4092, 11 extra bits
            assert bits(11) == 4         # d = 4097 -> word 0, transform 4
            out += b"Time "
            continue
        pos = (pos + 7) & ~7
        out += data[pos >> 3:(pos >> 3) + mlen]
        pos += mlen * 8
    return bytes(out)


def main_ce(fixture_dir, n_pages):
    """Independent re-decode of the Content-Encoding fixture: stdlib
    gzip/zlib (+ a minimal uncompressed-metablock brotli reader)
    against the closed-form page formulas. Pages cycle gzip /
    zlib-deflate / gzip-under-chunked / raw-deflate / brotli by
    i % 5."""
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
            elif enc == "br":
                body = brotli_uncompressed(body)
            got[fields["warc-target-uri"]] = body
    ok = True
    for i in range(n_pages):
        g = i % 700
        html = ("<html><title>t%d</title><body>warc document %d alpha "
                "beta gamma %d</body></html>" % (g, g, (g * 37) % 1000))
        if i % 5 == 4:
            html = "Time " + html   # the br dictionary-reference prefix
        url = "http://site%d.example/p%d" % (i % 50, i)
        if got.get(url) != html.encode():
            ok = False
            print("FAIL page %d: %r" % (i, got.get(url, b"")[:60]))
    print("WARC_ORACLE %s (%d pages, content-encoding re-decode)"
          % ("PASS" if ok else "FAIL", len(got)))
    sys.exit(0 if ok else 1)


def gzip_members(path):
    """Yield (offset, length, decompressed_bytes) per gzip MEMBER —
    an independent RFC 1952 member walk (header parse + raw-deflate
    inflate + trailer), no graft code."""
    data = open(path, "rb").read()
    off = 0
    while off < len(data):
        start = off
        assert data[off] == 0x1F and data[off + 1] == 0x8B, hex(off)
        assert data[off + 2] == 8
        flg = data[off + 3]
        off += 10
        if flg & 4:
            xl = data[off] | (data[off + 1] << 8)
            off += 2 + xl
        if flg & 8:
            while data[off] != 0:
                off += 1
            off += 1
        if flg & 16:
            while data[off] != 0:
                off += 1
            off += 1
        if flg & 2:
            off += 2
        d = zlib.decompressobj(-15)
        payload = d.decompress(data[off:])
        off = len(data) - len(d.unused_data)
        crc, isize = struct.unpack_from("<II", data, off)
        off += 8
        assert zlib.crc32(payload) & 0xFFFFFFFF == crc
        assert len(payload) & 0xFFFFFFFF == isize
        yield start, off - start, payload


def surt(url):
    """SURT urlkey (host reversed, scheme dropped) — the standard CDX
    key form; minimal: host,comma-reversed )/path."""
    u = url
    if "://" in u:
        u = u.split("://", 1)[1]
    host, _, path = u.partition("/")
    host = host.split(":")[0]
    return ",".join(reversed(host.split("."))) + ")/" + path


def main_cdxj(d, block_lines=0, shards=0):
    """Write ONE index.cdxj covering every .warc.gz in `d` — the
    INDEPENDENT-WRITER evidence for the engine's foreign-CDX(J)
    consumption: offsets/lengths come from this walk alone.
    With (block_lines, shards) also write the SHARDED Common Crawl
    layout under `d`/indexes: cdx-%05d.gz shards whose blocks are
    independently-gzipped members, plus a sorted cluster.idx
    secondary index (urlkey ts, shard, offset, length, seq)."""
    lines = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".warc.gz"):
            continue
        for off, ln, payload in gzip_members(os.path.join(d, name)):
            f = io.BytesIO(payload)
            for fields, block in records(f, name):
                if fields.get("warc-type") != "response":
                    continue
                url = fields["warc-target-uri"]
                status, ctype, body = http_split(block)
                ts = fields.get("warc-date", "1970-01-01T00:00:00Z")
                ts14 = "".join(c for c in ts if c.isdigit())[:14]
                lines.append("%s %s %s" % (surt(url), ts14, json.dumps({
                    "url": url,
                    "mime": ctype or "text/plain",
                    "status": str(status),
                    "digest": hashlib.md5(body).hexdigest(),
                    "length": str(ln),
                    "offset": str(off),
                    "filename": name}, separators=(",", ":"))))
    lines.sort()
    # '_'-prefixed so data-file listings skip it (the _SUCCESS rule)
    out = os.path.join(d, "_index.cdxj")
    with open(out + ".tmp", "w") as fo:
        fo.write("\n".join(lines) + "\n")
    os.replace(out + ".tmp", out)
    if block_lines and shards:
        idxdir = os.path.join(d, "indexes")
        os.makedirs(idxdir, exist_ok=True)
        bufs = [io.BytesIO() for _ in range(shards)]
        cluster = []
        nblocks = (len(lines) + block_lines - 1) // block_lines
        for bi in range(nblocks):
            blk = lines[bi * block_lines:(bi + 1) * block_lines]
            sh = bi % shards
            off = bufs[sh].tell()
            data = gzip.compress(("\n".join(blk) + "\n").encode())
            bufs[sh].write(data)
            key2 = " ".join(blk[0].split(" ", 2)[:2])
            cluster.append("%s\tcdx-%05d.gz\t%d\t%d\t%d"
                           % (key2, sh, off, len(data), bi))
        for sh in range(shards):
            p = os.path.join(idxdir, "cdx-%05d.gz" % sh)
            with open(p + ".tmp", "wb") as fo:
                fo.write(bufs[sh].getvalue())
            os.replace(p + ".tmp", p)
        ci = os.path.join(idxdir, "cluster.idx")
        with open(ci + ".tmp", "w") as fo:
            fo.write("\n".join(cluster) + "\n")
        os.replace(ci + ".tmp", ci)
    print("WARC_ORACLE cdxj PASS (%d lines -> %s)" % (len(lines), out))


def main_cdxj_check(d):
    """Validate ENGINE-exported `.cdxj` twins (option("cdxj","true"))
    against the archive bytes — the independent-reader half of the
    interop loop: every line's surt key, timestamp, status, digest,
    member offset/length, and filename are recomputed from this walk
    alone, and the line order must be (urlkey, timestamp)-sorted as
    pywb requires."""
    n_lines = 0
    n_files = 0
    ok = True
    for name in sorted(os.listdir(d)):
        if not name.endswith(".warc.gz"):
            continue
        twin = os.path.join(d, name + ".cdxj")
        if not os.path.exists(twin):
            print("FAIL %s: no .cdxj twin" % name)
            ok = False
            continue
        n_files += 1
        expect = {}
        for off, ln, payload in gzip_members(os.path.join(d, name)):
            f = io.BytesIO(payload)
            for fields, block in records(f, name):
                url = fields.get("warc-target-uri")
                if url is None:
                    continue  # warcinfo etc. — not a capture
                rt = fields.get("warc-type")
                status, ctype, body = http_split(block)
                ts = fields.get("warc-date", "1970-01-01T00:00:00Z")
                ts14 = "".join(c for c in ts if c.isdigit())[:14]
                expect[off] = (ln, url, ts14, status, ctype, rt,
                               hashlib.md5(body).hexdigest())
        lines = [l for l in open(twin).read().splitlines() if l]
        if lines != sorted(lines):
            print("FAIL %s: lines not (urlkey, ts)-sorted" % twin)
            ok = False
        if len(lines) != len(expect):
            print("FAIL %s: %d lines vs %d captures in the archive"
                  % (twin, len(lines), len(expect)))
            ok = False
        for l in lines:
            key, ts14, js = l.split(" ", 2)
            j = json.loads(js)
            off = int(j["offset"])
            exp = expect.get(off)
            if exp is None:
                print("FAIL %s: offset %d not a member start" % (twin, off))
                ok = False
                continue
            ln, url, ets, status, ctype, rt, digest = exp
            checks = [
                (key == surt(url), "surt key"),
                (ts14 == ets, "timestamp"),
                (int(j["length"]) == ln, "member length"),
                (j["filename"] == name, "filename"),
                (j["url"] == url, "url"),
            ]
            if rt == "revisit":
                checks.append((j["mime"] == "warc/revisit", "revisit mime"))
                checks.append((bool(j.get("digest")), "revisit digest"))
            else:
                checks.append((j.get("status") == str(status), "status"))
                checks.append((j.get("digest") == digest, "digest"))
            for cond, what in checks:
                if not cond:
                    print("FAIL %s offset %d: %s mismatch (%r)"
                          % (twin, off, what, l[:100]))
                    ok = False
            n_lines += 1
    print("WARC_ORACLE cdxj-check %s (%d lines over %d archives)"
          % ("PASS" if ok else "FAIL", n_lines, n_files))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if sys.argv[1] == "cdxj-check":
        main_cdxj_check(sys.argv[2])
    elif sys.argv[1] == "ce":
        main_ce(sys.argv[2], int(sys.argv[3]))
    elif sys.argv[1] == "cdxj":
        main_cdxj(sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 0,
                  int(sys.argv[4]) if len(sys.argv) > 4 else 0)
    else:
        main(sys.argv[1], int(sys.argv[2]))
