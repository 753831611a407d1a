#!/usr/bin/env python3
"""Independently derive the deterministic results of the pcap queries from
the synthetic capture (pure struct-level decode — no Spark, no graft code),
cross-check them against the Spark outputs in <verifyOutDir>, and emit the
DuckDB VALUES oracle SQL to pin into SparkEntry.oracleSql.

The synth capture is a pure function of packet index (PcapSynth.scala), so
its query results are constants; a VALUES oracle is therefore a real
cross-check, not a self-fulfilling one, because THIS script derives the
values with an independent decoder. Usage: gen_pcap_oracles.py <verifyOutDir>
"""
import glob, hashlib, struct, sys
from collections import Counter

import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v2"
data = open("/tmp/graft_synth_32m.pcap", "rb").read()
assert struct.unpack_from("<I", data, 0)[0] == 0xA1B2C3D4

ports = Counter()          # dst_port -> n  (None = no L4 port, e.g. ARP)
qtypes = Counter()         # qtype_str -> n
qnames = {}                # qtype_str -> set of qnames
proto = Counter()          # (ether_type, protocol) -> [n, bytes]
proto_bytes = Counter()
md5s = Counter()

QT = {1: "A", 28: "AAAA"}

def parse_qname(payload, off):
    labels = []
    while payload[off] != 0:
        n = payload[off]
        labels.append(payload[off + 1:off + 1 + n].decode("ascii"))
        off += 1 + n
    return ".".join(labels).lower() + ".", off + 1

offp = 24
while offp < len(data):
    ts, us, cl, ol = struct.unpack_from("<IIII", data, offp)
    offp += 16
    frame = data[offp:offp + cl]
    offp += cl
    md5s[hashlib.md5(frame).hexdigest().upper()] += 1
    et = struct.unpack_from(">H", frame, 12)[0]
    if et == 0x0806:
        proto[("arp", None)] += 1
        proto_bytes[("arp", None)] += cl
        ports[None] += 1
        continue
    assert et == 0x0800
    p = frame[14 + 9]
    assert p == 17
    proto[("IPv4", "UDP")] += 1
    proto_bytes[("IPv4", "UDP")] += cl
    ihl = (frame[14] & 0xF) * 4
    dport = struct.unpack_from(">H", frame, 14 + ihl + 2)[0]
    ports[dport] += 1
    if dport == 53:
        payload = frame[14 + ihl + 8:]
        qname, qoff = parse_qname(payload, 12)
        qtype = struct.unpack_from(">H", payload, qoff)[0]
        qs = QT[qtype]
        qtypes[qs] += 1
        qnames.setdefault(qs, set()).add(qname)

fails = 0
def check(name, expect_rows, got_rows):
    global fails
    if sorted(map(str, expect_rows)) != sorted(map(str, got_rows)):
        print(f"FAIL {name}")
        for a, b in zip(sorted(map(str, expect_rows))[:3],
                        sorted(map(str, got_rows))[:3]):
            print("  want", a, "\n  got ", b)
        fails += 1
    else:
        print(f"OK   {name} ({len(expect_rows)} rows)")

def spark_rows(name, cols):
    t = pq.read_table(glob.glob(f"{out}/{name}/*.parquet")[0]).to_pandas()
    return [tuple(None if v != v else (int(v) if isinstance(v, float) and
            float(v).is_integer() and c not in ("brightness",) else v)
            for c, v in zip(cols, row))
            for row in t[list(cols)].itertuples(index=False, name=None)]

# ---- pcap_port_histogram: top 50 by (n desc, port asc) -------------------
hist = sorted(ports.items(),
              key=lambda kv: (-kv[1], kv[0] if kv[0] is not None else 1 << 30))[:50]
check("pcap_port_histogram", [(p, n) for p, n in hist],
      spark_rows("pcap_port_histogram", ("dst_port", "n")))

# ---- pcap_dns_qtype_agg --------------------------------------------------
qt_rows = [(k, qtypes[k], len(qnames[k])) for k in sorted(qtypes)]
check("pcap_dns_qtype_agg", qt_rows,
      spark_rows("pcap_dns_qtype_agg", ("dns_qtype_str", "n", "n_names")))

# ---- pcap_dedup_md5 ------------------------------------------------------
dup_groups = {m: c for m, c in md5s.items() if c > 1}
md5_row = (len(dup_groups), sum(dup_groups.values()))
check("pcap_dedup_md5", [md5_row],
      spark_rows("pcap_dedup_md5", ("n_dup_groups", "n_dup_packets")))

# ---- pcap_protocol_mix ---------------------------------------------------
mix_rows = [(et, pr, proto[(et, pr)], proto_bytes[(et, pr)])
            for (et, pr) in sorted(proto, key=str)]
check("pcap_protocol_mix", mix_rows,
      spark_rows("pcap_protocol_mix", ("ether_type", "protocol", "n", "bytes")))

# flow top-25: per-(dst, dst_port) UDP rollup, order (n desc, dst asc, port asc)
if glob.glob(f"{out}/pcap_flow_topn/*.parquet"):
    from collections import defaultdict
    flows = defaultdict(lambda: [0, 0, 1 << 62, 0])
    off3 = 24
    while off3 < len(data):
        ts3, us3, cl3, ol3 = struct.unpack_from("<IIII", data, off3)
        off3 += 16
        fr = data[off3:off3 + cl3]; off3 += cl3
        if struct.unpack_from(">H", fr, 12)[0] != 0x0800 or fr[14 + 9] != 17:
            continue
        ihl3 = (fr[14] & 0xF) * 4
        dstip = ".".join(str(b) for b in fr[14 + 16:14 + 20])
        dp3 = struct.unpack_from(">H", fr, 14 + ihl3 + 2)[0]
        f3 = flows[(dstip, dp3)]
        f3[0] += 1; f3[1] += cl3
        f3[2] = min(f3[2], ts3); f3[3] = max(f3[3], ts3)
    expect_fl = sorted(((d3, p3, n3, b3, mn3, mx3)
                        for (d3, p3), (n3, b3, mn3, mx3) in flows.items()),
                       key=lambda r: (-r[2], r[0], r[1]))[:25]
    gotf = pq.read_table(
        glob.glob(f"{out}/pcap_flow_topn/*.parquet")[0]).to_pandas()
    got_fl = [(r.dst, int(r.dst_port), int(r.n_packets), int(r.total_bytes),
               int(r.first_ts), int(r.last_ts)) for r in gotf.itertuples()]
    if sorted(got_fl) != sorted(expect_fl):
        print("FAIL pcap_flow_topn"); fails += 1
    else:
        print(f"OK   pcap_flow_topn ({len(got_fl)} flows of {len(flows)})")

# ---- pcap_sll_decode: Linux cooked v1 + SLL2 files ----------------------
if glob.glob(f"{out}/pcap_sll_decode/*.parquet"):
    from collections import defaultdict
    sll = defaultdict(lambda: [0, 0, set()])
    for path, hdrlen, proto_off in (
            ("/tmp/graft_synth_sll/cooked_v1.pcap", 16, 14),
            ("/tmp/graft_synth_sll/cooked_v2.pcap", 20, 0)):
        sd = open(path, "rb").read()
        lt = struct.unpack_from("<I", sd, 20)[0]
        assert lt in (113, 276), lt
        o = 24
        while o < len(sd):
            _, _, cl4, _ = struct.unpack_from("<IIII", sd, o)
            o += 16
            fr = sd[o:o + cl4]; o += cl4
            assert struct.unpack_from(">H", fr, proto_off)[0] == 0x0800
            ip0 = hdrlen
            ihl4 = (fr[ip0] & 0xF) * 4
            assert fr[ip0 + 9] == 17  # UDP
            sp = struct.unpack_from(">H", fr, ip0 + ihl4)[0]
            dp = struct.unpack_from(">H", fr, ip0 + ihl4 + 2)[0]
            g = sll[("IPv4", dp)]
            g[0] += 1; g[1] += cl4; g[2].add(sp)
    sll_rows = [(et, dp, n, b, len(s))
                for (et, dp), (n, b, s) in sorted(sll.items())]
    check("pcap_sll_decode", sll_rows,
          spark_rows("pcap_sll_decode",
                     ("ether_type", "dst_port", "n", "bytes",
                      "n_src_ports")))

print("independent derivation:", "FAIL" if fails else "PASS")
if fails:
    sys.exit(1)

# ---- emit the VALUES oracle SQL -----------------------------------------
def lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)

def values_sql(rows, cols, types):
    vals = ",\n        ".join(
        "(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    sel = ", ".join(f"CAST(v.{c} AS {t}) AS {c}" for c, t in zip(cols, types))
    return (f"SELECT {sel}\n        FROM (VALUES {vals}) "
            f"AS v({', '.join(cols)})")

# ---- pcap_dns_tunnel_signals: per-SLD subdomain stats, top 20 -----------
sld_groups = {}
offp = 24
while offp < len(data):
    ts, us, cl, ol = struct.unpack_from("<IIII", data, offp)
    offp += 16
    frame = data[offp:offp + cl]
    offp += cl
    if struct.unpack_from(">H", frame, 12)[0] != 0x0800:
        continue
    ihl = (frame[14] & 0xF) * 4
    if frame[14 + 9] != 17:
        continue
    if struct.unpack_from(">H", frame, 14 + ihl + 2)[0] != 53:
        continue
    payload = frame[14 + ihl + 8:]
    qn, _ = parse_qname(payload, 12)
    parts = qn.rstrip('.').split('.')
    sld = parts[-2] + '.' + parts[-1] + '.'
    g = sld_groups.setdefault(sld, [0, set(), 0, 0])
    g[0] += 1; g[1].add(qn); g[2] += len(qn); g[3] = max(g[3], len(qn))
tunnel = sorted(
    ((s, n, len(u), tl, ml, len(u) / n)
     for s, (n, u, tl, ml) in sld_groups.items()),
    key=lambda r: (-r[5], r[0]))[:20]
check("pcap_dns_tunnel_signals", tunnel,
      spark_rows("pcap_dns_tunnel_signals",
                 ("sld", "n_queries", "n_unique", "total_len", "max_len",
                  "uniq_rate")))

print("\n=== pcap_port_histogram ===")
print(values_sql(hist, ("dst_port", "n"), ("INT", "BIGINT")))
print("\n=== pcap_dns_qtype_agg ===")
print(values_sql(qt_rows, ("dns_qtype_str", "n", "n_names"),
                 ("VARCHAR", "BIGINT", "BIGINT")))
print("\n=== pcap_dedup_md5 ===")
print(values_sql([md5_row], ("n_dup_groups", "n_dup_packets"),
                 ("BIGINT", "BIGINT")))
print("\n=== pcap_protocol_mix ===")
print(values_sql(mix_rows, ("ether_type", "protocol", "n", "bytes"),
                 ("VARCHAR", "VARCHAR", "BIGINT", "BIGINT")))

# ---- pcap_dns_latency: re-decode + re-pair the conversation capture ------
import os
qrp = "/tmp/graft_synth_qr.pcap"
if os.path.exists(qrp) and glob.glob(f"{out}/pcap_dns_latency/*.parquet"):
    qd = open(qrp, "rb").read()
    assert struct.unpack_from("<I", qd, 0)[0] == 0xA1B2C3D4
    RC = {0: "NOERROR", 3: "NXDOMAIN"}
    queries, responses = {}, {}
    qoff = 24
    while qoff < len(qd):
        sec, us, cl, ol = struct.unpack_from("<IIII", qd, qoff)
        qoff += 16
        frame = qd[qoff:qoff + cl]; qoff += cl
        ihl3 = (frame[14] & 0xF) * 4
        sp, dp = struct.unpack_from(">HH", frame, 14 + ihl3)
        srca = ".".join(str(b) for b in frame[26:30])
        dsta = ".".join(str(b) for b in frame[30:34])
        payload = frame[14 + ihl3 + 8:]
        qid, flags = struct.unpack_from(">HH", payload, 0)
        qn, _ = parse_qname(payload, 12)
        ts_us = sec * 1000000 + us
        if flags & 0x8000:
            responses[(qid, qn, dsta, srca)] = (flags & 0xF, ts_us)
        else:
            queries[(qid, qn, srca, dsta)] = ts_us
    lat_agg = {}
    for k, tq in queries.items():
        resp = responses.get(k)
        g = "UNANSWERED" if resp is None else RC[resp[0]]
        e = lat_agg.setdefault(g, [0, None, None, 0])
        e[0] += 1
        if resp is not None:
            lat = resp[1] - tq
            e[1] = lat if e[1] is None else min(e[1], lat)
            e[2] = lat if e[2] is None else max(e[2], lat)
            e[3] += lat
    lat_rows = sorted((g, v[0], v[1], v[2],
                       v[3] if v[1] is not None else None)
                      for g, v in lat_agg.items())
    check("pcap_dns_latency", lat_rows,
          spark_rows("pcap_dns_latency",
                     ("rcode", "n", "min_us", "max_us", "sum_us")))
    print("\n=== pcap_dns_latency ===")
    print(values_sql(lat_rows, ("rcode", "n", "min_us", "max_us", "sum_us"),
                     ("VARCHAR", "BIGINT", "BIGINT", "BIGINT", "BIGINT")))

# ---- pcap_tcp_reassembly: independent derivation ------------------------
# Mirrors PcapSynth.tcpFlowPayload/tcpFlowSegments (pure functions of f):
# flow f payload = b"flow<f>|" + 40+(f%160) bytes of (33+(f*7+j*11)%94),
# split into 2+(f%4) segments. Derivation here re-decodes the CAPTURE
# (not the formulas) so a synth/decoder disagreement fails the check.
import hashlib
TCPF = "/tmp/graft_synth_tcpflows.pcap"
try:
    tdata = open(TCPF, "rb").read()
except FileNotFoundError:
    tdata = None
if tdata is not None:
    assert struct.unpack_from("<I", tdata, 0)[0] == 0xA1B2C3D4
    flows = {}
    offt = 24
    while offt < len(tdata):
        ts, us, cl, ol = struct.unpack_from("<IIII", tdata, offt)
        offt += 16
        frame = tdata[offt:offt + cl]
        offt += cl
        assert struct.unpack_from(">H", frame, 12)[0] == 0x0800
        ihl = (frame[14] & 0xF) * 4
        assert frame[14 + 9] == 6
        l4 = 14 + ihl
        sp, dp = struct.unpack_from(">HH", frame, l4)
        seq = struct.unpack_from(">I", frame, l4 + 4)[0]
        hdr = ((frame[l4 + 12] >> 4) & 0xF) * 4
        payload = frame[l4 + hdr:]
        src = ".".join(str(b) for b in frame[26:30])
        dst = ".".join(str(b) for b in frame[30:34])
        flows.setdefault((src, dst, sp, dp), []).append((seq, payload))
    re_rows = []
    for (src, dst, sp, dp), segs in flows.items():
        segs.sort()
        stream = b"".join(p for _, p in segs)
        re_rows.append((src, dst, sp, dp, len(segs), len(stream),
                        hashlib.md5(stream).hexdigest()))
    re_rows.sort()
    cols = ("src", "dst", "src_port", "dst_port", "n_seg", "stream_len",
            "stream_md5")
    import os
    if glob.glob(f"{out}/pcap_tcp_reassembly/*.parquet"):
        check("pcap_tcp_reassembly", re_rows,
              spark_rows("pcap_tcp_reassembly", cols))
    print("\n=== pcap_tcp_reassembly ===")
    print(values_sql(re_rows, cols,
                     ("VARCHAR", "VARCHAR", "INT", "INT", "BIGINT", "INT",
                      "VARCHAR")))

# ---- pcap_http_requests: reassemble + parse request headers -------------
import re as _re
HTTPF = "/tmp/graft_synth_httpflows2.pcap"
try:
    hdata = open(HTTPF, "rb").read()
except FileNotFoundError:
    hdata = None
if hdata is not None:
    assert struct.unpack_from("<I", hdata, 0)[0] == 0xA1B2C3D4
    hflows = {}
    offh = 24
    while offh < len(hdata):
        ts, us, cl, ol = struct.unpack_from("<IIII", hdata, offh)
        offh += 16
        frame = hdata[offh:offh + cl]
        offh += cl
        ihl = (frame[14] & 0xF) * 4
        l4 = 14 + ihl
        sp, dp = struct.unpack_from(">HH", frame, l4)
        seq = struct.unpack_from(">I", frame, l4 + 4)[0]
        hdr = ((frame[l4 + 12] >> 4) & 0xF) * 4
        key = (".".join(str(b) for b in frame[26:30]),
               ".".join(str(b) for b in frame[30:34]), sp, dp)
        hflows.setdefault(key, []).append((seq, frame[l4 + hdr:]))
    agg = {}
    paths = {}
    for key, segs in hflows.items():
        segs.sort()
        txt = b"".join(p for _, p in segs).decode("ascii")
        m = _re.search(r"^(\w+) ", txt)
        p = _re.search(r"^\w+ (\S+) HTTP/1\.1", txt)
        h = _re.search(r"(?i)\r\nHost:[ \t]*(\S+)[ \t]*\r\n", txt)
        a = _re.search(r"\r\nUser-Agent: (\S+)\r\n", txt)
        k = (m.group(1) if m else "", h.group(1) if h else "",
             a.group(1) if a else "")
        agg[k] = agg.get(k, 0) + 1
        paths.setdefault(k, set()).add(p.group(1) if p else "")
    hrows = sorted((m, h, a, n, len(paths[(m, h, a)]))
                   for (m, h, a), n in agg.items())
    hcols = ("method", "host", "agent", "n", "n_paths")
    if glob.glob(f"{out}/pcap_http_requests/*.parquet"):
        check("pcap_http_requests", hrows,
              spark_rows("pcap_http_requests", hcols))
    print("\n=== pcap_http_requests ===")
    print(values_sql(hrows, hcols,
                     ("VARCHAR", "VARCHAR", "VARCHAR", "BIGINT", "BIGINT")))
