#!/usr/bin/env python3
"""Independent struct-level pcap oracle: re-decodes the synthetic capture
with plain Python and cross-checks the Spark outputs of the pcap queries
(which DuckDB cannot oracle). Usage: pcap_oracle.py <verifyOutDir>"""
import glob, struct, sys
from collections import Counter
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify01"
data = open("/tmp/graft_synth_32m.pcap", "rb").read()
assert struct.unpack_from("<I", data, 0)[0] == 0xA1B2C3D4
off, ports, proto_mix, md5_dups = 24, Counter(), Counter(), Counter()
n = 0
while off < len(data):
    ts, us, cl, ol = struct.unpack_from("<IIII", data, off)
    off += 16
    frame = data[off:off + cl]; off += cl
    n += 1
    et = struct.unpack_from(">H", frame, 12)[0]
    if et == 0x0806:
        proto_mix[("arp", None)] += 1
        continue
    assert et == 0x0800
    proto = frame[14 + 9]
    assert proto == 17
    proto_mix[("IPv4", "UDP")] += 1
    ihl = (frame[14] & 0xF) * 4
    dport = struct.unpack_from(">H", frame, 14 + ihl + 2)[0]
    ports[dport] += 1

fails = 0
# port histogram: Spark emits top 50 by (n desc, port asc)
got = pq.read_table(glob.glob(f"{out}/pcap_port_histogram/*.parquet")[0]).to_pandas()
expect = sorted(ports.items(), key=lambda kv: (-kv[1], kv[0]))
# null port bucket = ARP frames
arp = proto_mix[("arp", None)]
full = sorted(list(ports.items()) + [(None, arp)],
              key=lambda kv: (-kv[1], kv[0] if kv[0] is not None else 1 << 30))[:50]
got_pairs = [(None if p != p else int(p), int(c))
             for p, c in zip(got.dst_port, got.n)]
if sorted(got_pairs, key=str) != sorted(full, key=str):
    print("FAIL pcap_port_histogram"); fails += 1
else:
    print(f"OK   pcap_port_histogram ({len(got_pairs)} buckets, {n} pkts)")

# protocol mix
gotm = pq.read_table(glob.glob(f"{out}/pcap_protocol_mix/*.parquet")[0]).to_pandas()
gm = {(r.ether_type, None if r.protocol != r.protocol else r.protocol): int(r.n)
      for r in gotm.itertuples()}
em = {k: v for k, v in proto_mix.items()}
if gm != em:
    print(f"FAIL pcap_protocol_mix: {gm} vs {em}"); fails += 1
else:
    print(f"OK   pcap_protocol_mix {gm}")

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

# pcapng: independent block-level parse of the synthesized .pcapng file
ngp = "/tmp/graft_synth_50k.pcapng"
import os
QT = {1: "A", 28: "AAAA"}

def parse_qname(payload, qoff):
    labels = []
    while payload[qoff] != 0:
        n2 = payload[qoff]
        labels.append(payload[qoff + 1:qoff + 1 + n2].decode("ascii"))
        qoff += 1 + n2
    return ".".join(labels).lower() + ".", qoff + 1

if os.path.exists(ngp) and glob.glob(f"{out}/pcapng_dns_qtype_agg/*.parquet"):
    nd = open(ngp, "rb").read()
    off2, qt_agg = 0, {}
    iface_lt = []
    while off2 < len(nd):
        btype, blen = struct.unpack_from("<II", nd, off2)
        body = nd[off2 + 8:off2 + blen - 4]
        if btype == 0x0A0D0D0A:
            assert struct.unpack_from("<I", body, 0)[0] == 0x1A2B3C4D
        elif btype == 1:
            iface_lt.append(struct.unpack_from("<H", body, 0)[0])
        elif btype == 6:
            ifid, tsh, tsl, cl, ol = struct.unpack_from("<IIIII", body, 0)
            ts_us = (tsh << 32) | tsl
            frame = body[20:20 + cl]
            if struct.unpack_from(">H", frame, 12)[0] == 0x0800:
                ihl2 = (frame[14] & 0xF) * 4
                if frame[14 + 9] == 17:
                    dp = struct.unpack_from(">H", frame, 14 + ihl2 + 2)[0]
                    if dp == 53:
                        payload = frame[14 + ihl2 + 8:]
                        qn, qo = parse_qname(payload, 12)
                        qt = struct.unpack_from(">H", payload, qo)[0]
                        k = QT[qt]
                        e = qt_agg.setdefault(k, [0, set(), 1 << 62, 0])
                        e[0] += 1
                        e[1].add(qn)
                        sec = ts_us // 1000000
                        e[2] = min(e[2], sec)
                        e[3] = max(e[3], sec)
        off2 += blen
    ng_rows = sorted((k, v[0], len(v[1]), v[2], v[3])
                     for k, v in qt_agg.items())
    gng = pq.read_table(glob.glob(
        f"{out}/pcapng_dns_qtype_agg/*.parquet")[0]).to_pandas()
    got_ng = sorted((r.dns_qtype_str, int(r.n), int(r.n_names),
                     int(r.min_ts), int(r.max_ts))
                    for r in gng.itertuples())
    if got_ng != ng_rows:
        print(f"FAIL pcapng_dns_qtype_agg: {got_ng} vs {ng_rows}"); fails += 1
    else:
        print(f"OK   pcapng_dns_qtype_agg {got_ng}")

# qname-suffix filter: independent re-decode of the 32 MB capture
if glob.glob(f"{out}/pcap_qname_filter/*.parquet"):
    off3, nfl, names, mn, mx = 24, 0, set(), None, None
    while off3 < len(data):
        ts3, us3, cl3, ol3 = struct.unpack_from("<IIII", data, off3)
        off3 += 16
        frame = data[off3:off3 + cl3]; off3 += cl3
        if struct.unpack_from(">H", frame, 12)[0] != 0x0800: continue
        ihl4 = (frame[14] & 0xF) * 4
        if frame[14 + 9] != 17: continue
        if struct.unpack_from(">H", frame, 14 + ihl4 + 2)[0] != 53: continue
        qn, _ = parse_qname(frame[14 + ihl4 + 8:], 12)
        if qn.endswith(".example7.com."):
            nfl += 1; names.add(qn)
            mn = ts3 if mn is None else min(mn, ts3)
            mx = ts3 if mx is None else max(mx, ts3)
    gq = pq.read_table(glob.glob(
        f"{out}/pcap_qname_filter/*.parquet")[0]).to_pandas()
    got_q = (int(gq.n[0]), int(gq.n_names[0]), int(gq.min_ts[0]),
             int(gq.max_ts[0]))
    exp_q = (nfl, len(names), mn, mx)
    if got_q != exp_q:
        print(f"FAIL pcap_qname_filter: {got_q} vs {exp_q}"); fails += 1
    else:
        print(f"OK   pcap_qname_filter {got_q}")

# cross-container dedup: md5 over raw frames of BOTH captures
if glob.glob(f"{out}/pcap_dedup_cross_container/*.parquet"):
    import hashlib
    md5c, md5n = {}, {}
    coff = 24
    while coff < len(data):
        _, _, ccl, _ = struct.unpack_from("<IIII", data, coff)
        coff += 16
        md5c[hashlib.md5(data[coff:coff + ccl]).hexdigest()] = \
            md5c.get(hashlib.md5(data[coff:coff + ccl]).hexdigest(), 0) + 1
        coff += ccl
    ngd = open("/tmp/graft_synth_50k.pcapng", "rb").read()
    noff = 0
    while noff < len(ngd):
        btype, blen = struct.unpack_from("<II", ngd, noff)
        if btype == 6:
            body = ngd[noff + 8:noff + blen - 4]
            _, _, _, ncl, _ = struct.unpack_from("<IIIII", body, 0)
            h = hashlib.md5(body[20:20 + ncl]).hexdigest()
            md5n[h] = md5n.get(h, 0) + 1
        noff += blen
    exp_cc = (sum(md5c.values()) + sum(md5n.values()),
              len(set(md5c) | set(md5n)), len(set(md5c) & set(md5n)))
    gc = pq.read_table(glob.glob(
        f"{out}/pcap_dedup_cross_container/*.parquet")[0]).to_pandas()
    got_cc = (int(gc.n_pkts[0]), int(gc.n_md5[0]), int(gc.n_shared_md5[0]))
    if got_cc != exp_cc:
        print(f"FAIL pcap_dedup_cross_container: {got_cc} vs {exp_cc}")
        fails += 1
    else:
        print(f"OK   pcap_dedup_cross_container {got_cc}")

# ipv6 mix: independent RFC 8200 ext-chain walk over the v6 capture
v6_p = "/tmp/graft_synth_v6.pcap"
if os.path.exists(v6_p) and glob.glob(f"{out}/pcap_ipv6_mix/*.parquet"):
    vd = open(v6_p, "rb").read()
    voff, vagg = 24, {}
    EXT = {0: "HopByHop", 43: "Routing", 44: "Fragment", 51: "AH",
           60: "DstOpts"}
    while voff < len(vd):
        _, _, vcl, _ = struct.unpack_from("<IIII", vd, voff)
        voff += 16
        frame = vd[voff:voff + vcl]; voff += vcl
        et = struct.unpack_from(">H", frame, 12)[0]
        if et == 0x0800:
            key = ("IPv4", None, None)
        else:
            assert et == 0x86DD
            ip = 14
            nxt = frame[ip + 6]
            off6, frag6, chain = 40, None, ""
            while True:
                if nxt == 44:
                    chain += "[Fragment]"; frag6 = True
                    nxt = frame[ip + off6]; off6 += 8
                elif nxt in EXT:
                    chain += "[" + EXT[nxt] + "]"
                    nl = frame[ip + off6 + 1]
                    nxt2 = frame[ip + off6]
                    off6 += (nl + 1) * 8
                    nxt = nxt2
                else:
                    chain += "[UDP]" if nxt == 17 else f"[{nxt}]"
                    break
            key = ("IPv6", frag6, chain)
        vagg[key] = vagg.get(key, 0) + 1
    exp_v6 = sorted(((k[0], k[1], k[2], n) for k, n in vagg.items()),
                    key=str)
    gv = pq.read_table(glob.glob(
        f"{out}/pcap_ipv6_mix/*.parquet")[0]).to_pandas()
    def _b(x):
        return None if x is None or x != x else bool(x)
    got_v6 = sorted(((r.ether_type, _b(r.frag),
                      None if r.ext_headers is None else r.ext_headers,
                      int(r.n)) for r in gv.itertuples()), key=str)
    if got_v6 != exp_v6:
        print(f"FAIL pcap_ipv6_mix: {got_v6} vs {exp_v6}"); fails += 1
    else:
        print(f"OK   pcap_ipv6_mix {got_v6}")

# dns-over-tcp: independent re-decode of the TCP capture (strip the
# 20-byte TCP header and the RFC 1035 2-byte length prefix)
tcp_p = "/tmp/graft_synth_tcp.pcap"
if os.path.exists(tcp_p) and glob.glob(f"{out}/pcap_dns_tcp_agg/*.parquet"):
    td = open(tcp_p, "rb").read()
    toff, tagg = 24, {}
    while toff < len(td):
        _, _, tcl, _ = struct.unpack_from("<IIII", td, toff)
        toff += 16
        frame = td[toff:toff + tcl]; toff += tcl
        assert struct.unpack_from(">H", frame, 12)[0] == 0x0800
        ihl5 = (frame[14] & 0xF) * 4
        assert frame[14 + 9] == 6  # TCP
        tcp_hl = (frame[14 + ihl5 + 12] >> 4) * 4
        payload = frame[14 + ihl5 + tcp_hl:]
        mlen = struct.unpack_from(">H", payload, 0)[0]
        msg = payload[2:2 + mlen]
        assert len(msg) == mlen
        qn, qo = parse_qname(msg, 12)
        qt = QT[struct.unpack_from(">H", msg, qo)[0]]
        e = tagg.setdefault(qt, [0, set()])
        e[0] += 1; e[1].add(qn)
    exp_t = sorted((k, v[0], len(v[1])) for k, v in tagg.items())
    gt = pq.read_table(glob.glob(
        f"{out}/pcap_dns_tcp_agg/*.parquet")[0]).to_pandas()
    got_t = sorted((r.dns_qtype_str, int(r.n), int(r.n_names))
                   for r in gt.itertuples())
    if got_t != exp_t:
        print(f"FAIL pcap_dns_tcp_agg: {got_t} vs {exp_t}"); fails += 1
    else:
        print(f"OK   pcap_dns_tcp_agg {got_t}")

# dns latency: full byte-level re-decode + re-pairing of the conversation
# capture (query joined to response on id/qname/swapped endpoints)
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
        assert struct.unpack_from(">H", frame, 12)[0] == 0x0800
        ihl3 = (frame[14] & 0xF) * 4
        assert frame[14 + 9] == 17
        sp, dp = struct.unpack_from(">HH", frame, 14 + ihl3)
        src = ".".join(str(b) for b in frame[26:30])
        dst = ".".join(str(b) for b in frame[30:34])
        payload = frame[14 + ihl3 + 8:]
        qid, flags = struct.unpack_from(">HH", payload, 0)
        qn, _ = parse_qname(payload, 12)
        ts_us = sec * 1000000 + us
        if flags & 0x8000:
            assert sp == 53
            responses[(qid, qn, dst, src)] = (flags & 0xF, ts_us)
        else:
            assert dp == 53
            queries[(qid, qn, src, dst)] = ts_us
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
    exp_lat = sorted((g, v[0], v[1], v[2], v[3] if v[1] is not None else None)
                     for g, v in lat_agg.items())
    gl = pq.read_table(glob.glob(
        f"{out}/pcap_dns_latency/*.parquet")[0]).to_pandas()
    def _i(x):
        return None if x != x else int(x)
    got_lat = sorted((r.rcode, int(r.n), _i(r.min_us), _i(r.max_us),
                      _i(r.sum_us)) for r in gl.itertuples())
    if got_lat != exp_lat:
        print(f"FAIL pcap_dns_latency: {got_lat} vs {exp_lat}"); fails += 1
    else:
        print(f"OK   pcap_dns_latency {[(g, n) for g, n, *_ in got_lat]}")

    # per-resolver health from the same independently decoded packets
    if glob.glob(f"{out}/pcap_resolver_health/*.parquet"):
        res = {}
        for (qid, qn, src, dst), tq in queries.items():
            e = res.setdefault(dst, [0, 0, 0])
            e[0] += 1
            resp = responses.get((qid, qn, src, dst))
            if resp is not None:
                e[1] += 1
                if resp[0] == 3:
                    e[2] += 1
        exp_rh = sorted((r, v[0], v[1], v[2], v[1] / v[0])
                        for r, v in res.items())
        gr = pq.read_table(glob.glob(
            f"{out}/pcap_resolver_health/*.parquet")[0]).to_pandas()
        got_rh = sorted((r.resolver, int(r.n_queries), int(r.n_answered),
                         int(r.n_nx), float(r.answer_rate))
                        for r in gr.itertuples())
        if got_rh != exp_rh:
            print(f"FAIL pcap_resolver_health: {got_rh[:2]} vs {exp_rh[:2]}")
            fails += 1
        else:
            print(f"OK   pcap_resolver_health ({len(got_rh)} resolvers)")

# ---- pcap_tcp_reassembly: independent re-decode + seq-sorted concat -----
if glob.glob(f"{out}/pcap_tcp_reassembly/*.parquet"):
    import hashlib
    tdata = open("/tmp/graft_synth_tcpflows.pcap", "rb").read()
    assert struct.unpack_from("<I", tdata, 0)[0] == 0xA1B2C3D4
    tflows = {}
    offt = 24
    while offt < len(tdata):
        _, _, cl, _ = struct.unpack_from("<IIII", tdata, offt)
        offt += 16
        frame = tdata[offt:offt + cl]
        offt += cl
        ihl = (frame[14] & 0xF) * 4
        l4 = 14 + ihl
        sp, dp = struct.unpack_from(">HH", frame, l4)
        seq = struct.unpack_from(">I", frame, l4 + 4)[0]
        hdr = ((frame[l4 + 12] >> 4) & 0xF) * 4
        key = (".".join(str(b) for b in frame[26:30]),
               ".".join(str(b) for b in frame[30:34]), sp, dp)
        tflows.setdefault(key, []).append((seq, frame[l4 + hdr:]))
    exp_re = sorted(
        (src, dst, sp, dp, len(v), len(b"".join(p for _, p in sorted(v))),
         hashlib.md5(b"".join(p for _, p in sorted(v))).hexdigest())
        for (src, dst, sp, dp), v in tflows.items())
    tr = pq.read_table(glob.glob(
        f"{out}/pcap_tcp_reassembly/*.parquet")[0]).to_pandas()
    got_re = sorted((r.src, r.dst, int(r.src_port), int(r.dst_port),
                     int(r.n_seg), int(r.stream_len), r.stream_md5)
                    for r in tr.itertuples())
    if got_re != exp_re:
        print(f"FAIL pcap_tcp_reassembly: {got_re[:1]} vs {exp_re[:1]}")
        fails += 1
    else:
        print(f"OK   pcap_tcp_reassembly ({len(got_re)} flows)")

# ---- pcap_tcp_reassembly_overlap: overlap-aware first-copy-wins sweep ---
if glob.glob(f"{out}/pcap_tcp_reassembly_overlap/*.parquet"):
    import hashlib
    odata = open("/tmp/graft_synth_tcpoverlap.pcap", "rb").read()
    assert struct.unpack_from("<I", odata, 0)[0] == 0xA1B2C3D4
    oflows = {}
    offo = 24
    pkt = 0
    while offo < len(odata):
        _, _, cl, _ = struct.unpack_from("<IIII", odata, offo)
        offo += 16
        frame = odata[offo:offo + cl]
        offo += cl
        pkt += 1
        ihl = (frame[14] & 0xF) * 4
        l4 = 14 + ihl
        sp, dp = struct.unpack_from(">HH", frame, l4)
        seq = struct.unpack_from(">I", frame, l4 + 4)[0]
        hdr = ((frame[l4 + 12] >> 4) & 0xF) * 4
        key = (".".join(str(b) for b in frame[26:30]),
               ".".join(str(b) for b in frame[30:34]), sp, dp)
        oflows.setdefault(key, []).append((seq, pkt, frame[l4 + hdr:]))

    def sweep(segs):
        """Seq-sorted sweep with a coverage frontier: fully-covered
        segments drop, straddling ones contribute only the tail past the
        frontier (first-copy-wins)."""
        cov, out_b = None, b""
        for seq, _, pay in sorted(segs, key=lambda s: (s[0], s[1])):
            end = seq + len(pay)
            if cov is not None and end <= cov:
                continue
            if cov is not None and seq < cov:
                pay = pay[cov - seq:]
            out_b += pay
            cov = end
        return out_b

    exp_ov = sorted(
        (src, dst, sp, dp, len(v), len(sweep(v)),
         hashlib.md5(sweep(v)).hexdigest())
        for (src, dst, sp, dp), v in oflows.items())
    ov = pq.read_table(glob.glob(
        f"{out}/pcap_tcp_reassembly_overlap/*.parquet")[0]).to_pandas()
    got_ov = sorted((r.src, r.dst, int(r.src_port), int(r.dst_port),
                     int(r.n_seg), int(r.stream_len), r.stream_md5)
                    for r in ov.itertuples())
    if got_ov != exp_ov or any(bool(t) for t in ov.truncated):
        print(f"FAIL pcap_tcp_reassembly_overlap: {got_ov[:1]} vs {exp_ov[:1]}")
        fails += 1
    else:
        print(f"OK   pcap_tcp_reassembly_overlap ({len(got_ov)} flows)")

# ---- pcap_http_requests: independent reassemble + header parse ----------
if glob.glob(f"{out}/pcap_http_requests/*.parquet"):
    import re as _re
    hdata = open("/tmp/graft_synth_httpflows2.pcap", "rb").read()
    assert struct.unpack_from("<I", hdata, 0)[0] == 0xA1B2C3D4
    hflows = {}
    offh = 24
    while offh < len(hdata):
        _, _, cl, _ = struct.unpack_from("<IIII", hdata, offh)
        offh += 16
        frame = hdata[offh:offh + cl]
        offh += cl
        ihl = (frame[14] & 0xF) * 4
        l4 = 14 + ihl
        sp, dp = struct.unpack_from(">HH", frame, l4)
        seq = struct.unpack_from(">I", frame, l4 + 4)[0]
        hdr = ((frame[l4 + 12] >> 4) & 0xF) * 4
        key = (".".join(str(b) for b in frame[26:30]), sp)
        hflows.setdefault(key, []).append((seq, frame[l4 + hdr:]))
    hagg, hpaths = {}, {}
    for key, segs in hflows.items():
        segs.sort()
        txt = b"".join(p for _, p in segs).decode("ascii")
        m = _re.search(r"^(\w+) ", txt)
        p = _re.search(r"^\w+ (\S+) HTTP/1\.1", txt)
        h = _re.search(r"(?i)\r\nHost:[ \t]*(\S+)[ \t]*\r\n", txt)
        a = _re.search(r"\r\nUser-Agent: (\S+)\r\n", txt)
        k = (m.group(1), h.group(1), a.group(1))
        hagg[k] = hagg.get(k, 0) + 1
        hpaths.setdefault(k, set()).add(p.group(1))
    exp_h = sorted((m, h, a, n, len(hpaths[(m, h, a)]))
                   for (m, h, a), n in hagg.items())
    hr = pq.read_table(glob.glob(
        f"{out}/pcap_http_requests/*.parquet")[0]).to_pandas()
    got_h = sorted((r.method, r.host, r.agent, int(r.n), int(r.n_paths))
                   for r in hr.itertuples())
    if got_h != exp_h:
        print(f"FAIL pcap_http_requests: {got_h[:1]} vs {exp_h[:1]}")
        fails += 1
    else:
        print(f"OK   pcap_http_requests ({len(got_h)} groups)")

# ---- round-5 fixtures: flags/ICMP/TLS, independently re-decoded ---------
def _frames(path):
    d = open(path, "rb").read()
    assert struct.unpack_from("<I", d, 0)[0] == 0xA1B2C3D4
    o = 24
    while o < len(d):
        ts, us, cl, _ = struct.unpack_from("<IIII", d, o)
        o += 16
        yield ts, us, d[o:o + cl]
        o += cl

def _v4(frame):
    ihl = (frame[14] & 0xF) * 4
    return (".".join(str(b) for b in frame[26:30]),
            ".".join(str(b) for b in frame[30:34]),
            frame[14 + 9], 14 + ihl)

_FLAG_NAMES = ["FIN", "SYN", "RST", "PSH", "ACK", "URG", "ECE", "CWR", "NS"]
def _flags(frame, l4):
    bits = frame[l4 + 13] | ((frame[l4 + 12] & 1) << 8)
    return "|".join(n for i, n in enumerate(_FLAG_NAMES) if bits >> i & 1)

def _cmp(name, got, exp):
    global fails
    if got is None:
        print(f"FAIL {name}: no Spark output")
        fails += 1
    elif got != exp:
        print(f"FAIL {name}: {got[:2]} vs {exp[:2]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")

def _read(name, cols):
    f = glob.glob(f"{out}/{name}/*.parquet")
    if not f:
        return None
    df = pq.read_table(f[0]).to_pandas()
    return sorted(tuple(r[c] for c in cols) for _, r in df.iterrows())

if glob.glob(f"{out}/pcap_tcp_handshake_rtt/*.parquet"):
    syns, synacks, flows, wins = {}, {}, {}, {}
    for ts, us, fr in _frames("/tmp/graft_synth_handshake.pcap"):
        src, dst, proto, l4 = _v4(fr)
        t = ts * 1_000_000 + us
        sp, dp = struct.unpack_from(">HH", fr, l4)
        seq = struct.unpack_from(">I", fr, l4 + 4)[0]
        fl = _flags(fr, l4)
        if fl == "SYN":
            syns[(src, dst, sp, dp)] = (seq, t)
            w = wins.setdefault((ts - ts % 10, src), set())
            w.add(dp)
        elif fl == "SYN|ACK":
            ack = struct.unpack_from(">I", fr, l4 + 8)[0]
            synacks[(src, dst, sp, dp)] = (ack, t)
        k2 = (min(src, dst), max(src, dst), min(sp, dp), max(sp, dp))
        e = flows.setdefault(k2, [0, 0, []])
        e[0] += 1
        e[1] += len(fr)
        e[2].append(t)

    exp_rtt, unanswered = [], {}
    for (src, dst, sp, dp), (seq, tq) in syns.items():
        rk = (dst, src, dp, sp)
        if rk in synacks and synacks[rk][0] == seq + 1:
            exp_rtt.append((src, dst, sp, synacks[rk][1] - tq))
        else:
            e = unanswered.setdefault(src, [0, set()])
            e[0] += 1
            e[1].add(dp)
    _cmp("pcap_tcp_handshake_rtt(redecode)",
         _read("pcap_tcp_handshake_rtt",
               ["client", "server", "client_port", "rtt_micro"]),
         sorted(exp_rtt))
    _cmp("pcap_syn_no_synack(redecode)",
         _read("pcap_syn_no_synack", ["scanner", "n_syn", "n_ports"]),
         sorted((s, n, len(ps)) for s, (n, ps) in unanswered.items()))
    _cmp("pcap_flow_features(redecode)",
         _read("pcap_flow_features",
               ["addr_lo", "addr_hi", "port_lo", "port_hi", "n_pkts",
                "total_bytes", "duration_micro"]),
         sorted((lo, hi, pl, ph, n, b, max(tt) - min(tt))
                for (lo, hi, pl, ph), (n, b, tt) in flows.items()))
    _cmp("pcap_syn_portscan_twin(redecode)",
         _read("pcap_syn_portscan_twin",
               ["window_start_s", "scanner", "n_ports"]),
         sorted((w, s, len(ps)) for (w, s), ps in wins.items()
                if len(ps) >= 3))
    subnets = {"clients": (10, 5), "scanners": (10, 6), "servers": (10, 9)}
    enrich = {}
    for ts, us, fr in _frames("/tmp/graft_synth_handshake.pcap"):
        src, _, _, _ = _v4(fr)
        a, b = (int(x) for x in src.split(".")[:2])
        for lbl, (pa, pb) in subnets.items():
            if (a, b) == (pa, pb):
                e = enrich.setdefault(lbl, [0, set()])
                e[0] += 1
                e[1].add(src)
    _cmp("pcap_subnet_enrich(redecode)",
         _read("pcap_subnet_enrich", ["subnet", "n_pkts", "n_src"]),
         sorted((l, n, len(s)) for l, (n, s) in enrich.items()))

if glob.glob(f"{out}/pcap_http_conversations/*.parquet"):
    import re as _re2
    dirs = {}
    for ts, us, fr in _frames("/tmp/graft_synth_httprr2.pcap"):
        src, dst, proto, l4 = _v4(fr)
        sp, dp = struct.unpack_from(">HH", fr, l4)
        seq = struct.unpack_from(">I", fr, l4 + 4)[0]
        hdr = ((fr[l4 + 12] >> 4) & 0xF) * 4
        dirs.setdefault((src, dst, sp, dp), []).append((seq, fr[l4 + hdr:]))
    reqs, rsps = {}, {}
    for (src, dst, sp, dp), segs in dirs.items():
        segs.sort()
        txt = b"".join(p for _, p in segs).decode("ascii")
        if dp == 80:
            reqs[(src, sp)] = _re2.search(r"(?i)\r\nHost:[ \t]*(\S+)[ \t]*\r\n", txt).group(1)
        else:
            rsps[(dst, dp)] = int(
                _re2.match(r"HTTP/1\.1 (\d+) ", txt).group(1))
    conv = {}
    for key, host in reqs.items():
        k = (host, rsps[key])
        conv[k] = conv.get(k, 0) + 1
    _cmp("pcap_http_conversations(redecode)",
         _read("pcap_http_conversations", ["host", "status", "n"]),
         sorted((h, st, c) for (h, st), c in conv.items()))

# pcap -> LLM-corpus bridge: reassemble both directions from the RAW
# capture, extract response bodies + request hosts, replay the quality
# gate and the exact dedup — fully independent of the Scala synthesis
# formulas the Spark-side constant oracle is generated from.
if glob.glob(f"{out}/pcap_http_to_corpus/*.parquet") or \
        glob.glob(f"{out}/pcap_corpus_stream_twin/*.parquet"):
    import gzip as _gzip
    import hashlib
    import re as _re3

    def _deframe(raw):
        """RFC 9112 body framing, independent of the Scala expression:
        chunked walk / Content-Length cut / close-framed, then gzip
        content decoding."""
        head, rest = raw.split(b"\r\n\r\n", 1)
        hdrs = {}
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            hdrs[k.strip().lower()] = v.strip()
        if b"chunked" in hdrs.get(b"transfer-encoding", b""):
            body, p = b"", 0
            while True:
                e = rest.index(b"\r\n", p)
                size = int(rest[p:e].split(b";")[0], 16)
                p = e + 2
                if size == 0:
                    break
                body += rest[p:p + size]
                assert rest[p + size:p + size + 2] == b"\r\n"
                p = p + size + 2
        elif b"content-length" in hdrs:
            body = rest[:int(hdrs[b"content-length"])]
        else:
            body = rest
        if hdrs.get(b"content-encoding", b"").lower() == b"gzip":
            body = _gzip.decompress(body)
        return body.decode("ascii")

    dirs = {}
    for ts, us, fr in _frames("/tmp/graft_synth_httpcorpus3.pcap"):
        src, dst, proto, l4 = _v4(fr)
        sp, dp = struct.unpack_from(">HH", fr, l4)
        seq = struct.unpack_from(">I", fr, l4 + 4)[0]
        hdr = ((fr[l4 + 12] >> 4) & 0xF) * 4
        dirs.setdefault((src, dst, sp, dp), []).append((seq, fr[l4 + hdr:]))
    bodies, chosts = {}, {}
    for (src, dst, sp, dp), segs in dirs.items():
        segs.sort()
        stream = b"".join(p for _, p in segs)
        if dp == 80:
            chosts[(src, sp)] = _re3.search(
                rb"(?i)\r\nHost:[ \t]*(\S+)[ \t]*\r\n", stream).group(1).decode("ascii")
        else:
            bodies[(dst, dp)] = _deframe(stream)
    groups = {}
    for (cl, cp), body in bodies.items():
        w = body.split(" ")
        if len(w) < 20 or len(set(w)) * 1000000 // len(w) < 300000:
            continue
        groups.setdefault(body, []).append((cp - 42000, chosts[(cl, cp)]))
    exp = []
    for body, ds in groups.items():
        ds.sort()
        did, host = ds[0]
        exp.append((did, host, len(body.split(" ")), len(ds),
                    hashlib.md5(body.encode()).hexdigest()))
    if glob.glob(f"{out}/pcap_http_to_corpus/*.parquet"):
        _cmp("pcap_http_to_corpus(redecode)",
             _read("pcap_http_to_corpus",
                   ["doc_id", "host", "n_tokens", "n_dups", "body_md5"]),
             sorted(exp))

    # streaming bridge's batch twin: the gated PRE-dedup relation (one
    # row per surviving conversation) re-derived from the same raw
    # reassembly — independent of both the Scala synthesis formulas and
    # the streaming state machine the spec checks against it.
    if glob.glob(f"{out}/pcap_corpus_stream_twin/*.parquet"):
        texp = []
        for (cl, cp), body in bodies.items():
            w = body.split(" ")
            if len(w) < 20 or len(set(w)) * 1000000 // len(w) < 300000:
                continue
            texp.append((cp - 42000, chosts[(cl, cp)], len(w),
                         hashlib.md5(body.encode()).hexdigest()))
        _cmp("pcap_corpus_stream_twin(redecode)",
             _read("pcap_corpus_stream_twin",
                   ["doc_id", "host", "n_tokens", "body_md5"]),
             sorted(texp))

# IPv4 fragment reassembly: independent byte-level re-decode of the
# fragmented capture — group fragments by (ip_id, endpoints) from RAW
# IP headers, sort by the 13-bit offset field, strip the UDP header
# from the offset-0 fragment, concatenate, and parse the DNS header +
# qname labels directly (no shared code with the Scala parser).
if glob.glob(f"{out}/pcap_ipv4_frag_reassembly/*.parquet"):
    fgroups = {}
    for ts, us, fr in _frames("/tmp/graft_synth_ipfrag.pcap"):
        src, dst, proto, _ = _v4(fr)
        ihl = (fr[14] & 0xF) * 4
        ipid = struct.unpack_from(">H", fr, 14 + 4)[0]
        ff = struct.unpack_from(">H", fr, 14 + 6)[0]
        off8 = (ff & 0x1FFF) * 8
        fgroups.setdefault((src, dst, ipid), []).append(
            (off8, fr[14 + ihl:]))
    fexp = []
    for (src, dst, ipid), frs in fgroups.items():
        frs.sort()
        msg = b"".join(
            p[8:] if off == 0 else p for off, p in frs)
        qid, flags = struct.unpack_from(">HH", msg, 0)
        rc = {0: "NOERROR", 3: "NXDOMAIN"}[flags & 0xF]
        labels, p = [], 12
        while msg[p] != 0:
            ln = msg[p]
            labels.append(msg[p + 1:p + 1 + ln].decode("ascii"))
            p += 1 + ln
        fexp.append((src, dst, ipid, len(frs), len(msg),
                     ".".join(labels).lower() + ".", rc))
    _cmp("pcap_ipv4_frag_reassembly(redecode)",
         _read("pcap_ipv4_frag_reassembly",
               ["src", "dst", "ip_id", "n_frags", "msg_len",
                "qname", "rcode"]),
         sorted(fexp))

# IPv6 fragment reassembly: same independent re-derivation against the
# v6 capture — fragments ride the Fragment EXTENSION header (RFC 8200
# §4.5: next-header 44 in the base header; 13-bit offset in 8-octet
# units at bits 15..3 of the header's third/fourth bytes; 32-bit id),
# addresses render java.net-style (full groups, no :: compression).
if glob.glob(f"{out}/pcap_ipv6_frag_reassembly/*.parquet"):
    def _v6addr(b):
        return ":".join(format((b[i] << 8) | b[i + 1], "x")
                        for i in range(0, 16, 2))
    f6groups = {}
    for ts, us, fr in _frames("/tmp/graft_synth_ip6frag.pcap"):
        assert struct.unpack_from(">H", fr, 12)[0] == 0x86DD
        assert fr[14 + 6] == 44  # next header: Fragment
        src = _v6addr(fr[14 + 8:14 + 24])
        dst = _v6addr(fr[14 + 24:14 + 40])
        ext = 14 + 40
        ff = struct.unpack_from(">H", fr, ext + 2)[0]
        off8 = (ff >> 3) * 8
        fid = struct.unpack_from(">I", fr, ext + 4)[0]
        f6groups.setdefault((src, dst, fid), []).append(
            (off8, fr[ext + 8:]))
    f6exp = []
    for (src, dst, fid), frs in f6groups.items():
        frs.sort()
        msg = b"".join(
            p[8:] if off == 0 else p for off, p in frs)
        qid, flags = struct.unpack_from(">HH", msg, 0)
        rc = {0: "NOERROR", 3: "NXDOMAIN"}[flags & 0xF]
        labels, p = [], 12
        while msg[p] != 0:
            ln = msg[p]
            labels.append(msg[p + 1:p + 1 + ln].decode("ascii"))
            p += 1 + ln
        f6exp.append((src, dst, fid, len(frs), len(msg),
                      ".".join(labels).lower() + ".", rc))
    _cmp("pcap_ipv6_frag_reassembly(redecode)",
         _read("pcap_ipv6_frag_reassembly",
               ["src", "dst", "ip_id", "n_frags", "msg_len",
                "qname", "rcode"]),
         sorted(f6exp))

if glob.glob(f"{out}/pcap_tcp_zero_window/*.parquet"):
    wflows = {}
    for ts, us, fr in _frames("/tmp/graft_synth_tcpwindow.pcap"):
        src, dst, proto, l4 = _v4(fr)
        win = struct.unpack_from(">H", fr, l4 + 14)[0]
        e = wflows.setdefault(src, [0, 0, 1 << 30, -1])
        e[0] += 1
        e[1] += 1 if win == 0 else 0
        e[2] = min(e[2], win)
        e[3] = max(e[3], win)
    _cmp("pcap_tcp_zero_window(redecode)",
         _read("pcap_tcp_zero_window",
               ["client", "n_pkts", "n_zero", "min_window", "max_window"]),
         sorted((s, n, z, lo, hi) for s, (n, z, lo, hi) in wflows.items()))

def _tls_parse(b):
    import hashlib
    if len(b) < 9 or b[0] != 0x16 or b[1] != 3 or b[5] != 1:
        return None
    end = min(len(b), 5 + struct.unpack_from(">H", b, 3)[0])
    p = 9
    legacy = struct.unpack_from(">H", b, p)[0]
    p += 34
    p += 1 + b[p]
    cs = struct.unpack_from(">H", b, p)[0]
    p += 2
    cipher_count = cs // 2
    ciphers = [struct.unpack_from(">H", b, p + 2 * i)[0]
               for i in range(cipher_count)]
    p += cs
    p += 1 + b[p]
    sni, alpn, v13, ext_types = None, None, False, []
    if p + 2 <= end:
        ext_end = min(end, p + 2 + struct.unpack_from(">H", b, p)[0])
        p += 2
        while p + 4 <= ext_end:
            et, el = struct.unpack_from(">HH", b, p)
            p += 4
            ee = p + el
            ext_types.append(et)
            if et == 0:
                nl = struct.unpack_from(">H", b, p + 3)[0]
                sni = b[p + 5:p + 5 + nl].decode("ascii")
            elif et == 16:
                al = b[p + 2]
                alpn = b[p + 3:p + 3 + al].decode("ascii")
            elif et == 43:
                q = p + 1
                while q + 2 <= ee:
                    if struct.unpack_from(">H", b, q)[0] == 0x0304:
                        v13 = True
                    q += 2
            p = ee
    ver = "TLS1.3" if v13 else {0x0303: "TLS1.2"}.get(legacy, hex(legacy))
    canon = "%d,%s,%s" % (legacy, "-".join(map(str, ciphers)),
                          "-".join(map(str, ext_types)))
    fp = hashlib.md5(canon.encode("ascii")).hexdigest()
    return sni, ver, cipher_count, alpn or "-", fp

if glob.glob(f"{out}/pcap_tls_sni/*.parquet"):
    exp_tls = []
    for ts, us, fr in _frames("/tmp/graft_synth_tlsflows.pcap"):
        src, _, _, l4 = _v4(fr)
        hdr = ((fr[l4 + 12] >> 4) & 0xF) * 4
        r = _tls_parse(fr[l4 + hdr:])
        if r:
            exp_tls.append((src,) + r[:4])
    _cmp("pcap_tls_sni(redecode)",
         _read("pcap_tls_sni",
               ["client", "sni", "version", "cipher_count", "alpn"]),
         sorted(exp_tls))

if glob.glob(f"{out}/pcap_tls_fingerprint/*.parquet"):
    fps = {}
    for ts, us, fr in _frames("/tmp/graft_synth_tlsflows.pcap"):
        src, _, _, l4 = _v4(fr)
        hdr = ((fr[l4 + 12] >> 4) & 0xF) * 4
        r = _tls_parse(fr[l4 + hdr:])
        if r:
            e = fps.setdefault(r[4], [0, set()])
            e[0] += 1
            e[1].add(r[0])
    _cmp("pcap_tls_fingerprint(redecode)",
         _read("pcap_tls_fingerprint", ["fp", "n_clients", "n_sni"]),
         sorted((fp, n, len(s)) for fp, (n, s) in fps.items()))

if glob.glob(f"{out}/pcap_tls_sni_reassembled/*.parquet"):
    tsegs = {}
    for ts, us, fr in _frames("/tmp/graft_synth_tlssegs.pcap"):
        src, dst, _, l4 = _v4(fr)
        sp, dp = struct.unpack_from(">HH", fr, l4)
        seq = struct.unpack_from(">I", fr, l4 + 4)[0]
        hdr = ((fr[l4 + 12] >> 4) & 0xF) * 4
        tsegs.setdefault((src, dst, sp, dp), []).append((seq, fr[l4 + hdr:]))
    exp_rtls = []
    for (src, _, _, _), segs in tsegs.items():
        segs.sort()
        r = _tls_parse(b"".join(p for _, p in segs))
        if r:
            exp_rtls.append((src,) + r[:4])
    _cmp("pcap_tls_sni_reassembled(redecode)",
         _read("pcap_tls_sni_reassembled",
               ["client", "sni", "version", "cipher_count", "alpn"]),
         sorted(exp_rtls))

if glob.glob(f"{out}/pcap_icmp_summary/*.parquet"):
    summ, reqs, reps = {}, {}, {}
    for ts, us, fr in _frames("/tmp/graft_synth_icmp.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 1
        t = ts * 1_000_000 + us
        ity, ico = fr[l4], fr[l4 + 1]
        e = summ.setdefault((ity, ico), [0, set()])
        e[0] += 1
        e[1].add(dst)
        if ity == 8:
            reqs[(src, dst)] = t
        elif ity == 0:
            reps[(src, dst)] = t
    _cmp("pcap_icmp_summary(redecode)",
         _read("pcap_icmp_summary",
               ["icmp_type", "icmp_code", "n", "n_dst"]),
         sorted((t, c, n, len(d)) for (t, c), (n, d) in summ.items()))
    _cmp("pcap_icmp_echo_rtt(redecode)",
         _read("pcap_icmp_echo_rtt", ["client", "rtt_micro"]),
         sorted((src, reps[(dst, src)] - t)
                for (src, dst), t in reqs.items() if (dst, src) in reps))

if glob.glob(f"{out}/pcap_sll_decode/*.parquet"):
    sll = {}
    for path, hdrlen, poff in (
            ("/tmp/graft_synth_sll/cooked_v1.pcap", 16, 14),
            ("/tmp/graft_synth_sll/cooked_v2.pcap", 20, 0)):
        sd = open(path, "rb").read()
        assert struct.unpack_from("<I", sd, 20)[0] in (113, 276)
        o = 24
        while o < len(sd):
            _, _, cl5, _ = struct.unpack_from("<IIII", sd, o)
            o += 16
            fr = sd[o:o + cl5]; o += cl5
            assert struct.unpack_from(">H", fr, poff)[0] == 0x0800
            ihl5 = (fr[hdrlen] & 0xF) * 4
            sp, dp = struct.unpack_from(">HH", fr, hdrlen + ihl5)
            e = sll.setdefault(("IPv4", dp), [0, 0, set()])
            e[0] += 1; e[1] += cl5; e[2].add(sp)
    _cmp("pcap_sll_decode(redecode)",
         _read("pcap_sll_decode",
               ["ether_type", "dst_port", "n", "bytes", "n_src_ports"]),
         sorted((et, dp, n, b, len(s))
                for (et, dp), (n, b, s) in sll.items()))

if glob.glob(f"{out}/pcap_lpm_enrich/*.parquet"):
    # independent LPM: compute every (masklen, prefix) in the route
    # table against each packet's src and keep the longest match
    routes = [("default", 0, 0),
              ("rfc1918-10", 10 << 24, 8),
              ("clients-16", (10 << 24) | (5 << 16), 16),
              ("scanners-16", (10 << 24) | (6 << 16), 16),
              ("scanner-24", (10 << 24) | (6 << 16), 24),
              ("servers-16", (10 << 24) | (9 << 16), 16),
              ("server-host", (10 << 24) | (9 << 16) | 1, 32)]
    lpm = {}
    for _, _, fr in _frames("/tmp/graft_synth_handshake.pcap"):
        src, _, _, _ = _v4(fr)
        ip = 0
        for part in src.split("."):
            ip = (ip << 8) | int(part)
        best = max((ml, name) for name, pfx, ml in routes
                   if (ip >> (32 - ml) << (32 - ml) if ml else 0) == pfx)
        e = lpm.setdefault(best[1], [0, set()])
        e[0] += 1
        e[1].add(src)
    _cmp("pcap_lpm_enrich(redecode)",
         _read("pcap_lpm_enrich", ["route", "n_pkts", "n_src"]),
         sorted((r, n, len(s)) for r, (n, s) in lpm.items()))

# TCP retransmission rollup: independent frontier sweep over the
# overlap capture in CAPTURE order (the Wireshark classification rule).
if glob.glob(f"{out}/pcap_tcp_retransmits/*.parquet"):
    rflows = {}
    for _, _, fr in _frames("/tmp/graft_synth_tcpoverlap.pcap"):
        src, dst, proto, l4 = _v4(fr)
        sp, dp = struct.unpack_from(">HH", fr, l4)
        seq = struct.unpack_from(">I", fr, l4 + 4)[0]
        hdr = ((fr[l4 + 12] >> 4) & 0xF) * 4
        plen = len(fr) - (l4 + hdr)
        rflows.setdefault((src, dst, sp, dp), []).append((seq, plen))
    rexp = []
    for (src, dst, sp, dp), segs in rflows.items():
        frontier = None
        n_in = n_part = n_re = dup = tot = 0
        for seq, ln in segs:  # capture order
            end = seq + ln
            tot += ln
            if frontier is None or seq >= frontier:
                n_in += 1
            elif end <= frontier:
                n_re += 1
            else:
                n_part += 1
            if frontier is not None and seq < frontier:
                dup += max(0, min(end, frontier) - seq)
            frontier = end if frontier is None else max(frontier, end)
        rexp.append((src, dst, sp, dp, len(segs), n_in, n_part, n_re,
                     dup, tot))
    _cmp("pcap_tcp_retransmits(redecode)",
         _read("pcap_tcp_retransmits",
               ["src", "dst", "src_port", "dst_port", "n_seg",
                "n_inorder", "n_partial", "n_retrans", "dup_bytes",
                "total_bytes"]),
         sorted(rexp))

# VXLAN decap: independent parse of the RFC 7348 header + inner
# Ethernet/IPv4/UDP/DNS from raw bytes (no shared code with Decap).
if glob.glob(f"{out}/pcap_vxlan_decap/*.parquet"):
    vstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_vxlan.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        dp = struct.unpack_from(">H", fr, l4 + 2)[0]
        assert dp == 4789
        vx = fr[l4 + 8:]
        assert vx[0] & 0x08
        vni = (vx[4] << 16) | (vx[5] << 8) | vx[6]
        inner = vx[8:]
        iihl = (inner[14] & 0xF) * 4
        il4 = 14 + iihl
        assert inner[14 + 9] == 17
        dns = inner[il4 + 8:]
        flags = struct.unpack_from(">H", dns, 2)[0]
        nx = 1 if (flags & 0xF) == 3 else 0
        labels, p = [], 12
        while dns[p] != 0:
            ln = dns[p]
            labels.append(dns[p + 1:p + 1 + ln].decode("ascii"))
            p += 1 + ln
        q = ".".join(labels).lower() + "."
        e = vstats.setdefault(vni, [0, 0, None])
        e[0] += 1
        e[1] += nx
        e[2] = q if e[2] is None else min(e[2], q)
    _cmp("pcap_vxlan_decap(redecode)",
         _read("pcap_vxlan_decap",
               ["vni", "n_pkts", "n_nx", "first_qname"]),
         sorted((v, n, nx, q) for v, (n, nx, q) in vstats.items()))

# GENEVE decap: independent parse of the RFC 8926 header — version,
# O/C flags, option-length words, the TLV option walk (must exactly
# tile the declared length), protocol type 0x6558 — then the inner
# Ethernet/IPv4/UDP/DNS from raw bytes (no shared code with Decap).
if glob.glob(f"{out}/pcap_geneve_decap/*.parquet"):
    gstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_geneve.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        dp = struct.unpack_from(">H", fr, l4 + 2)[0]
        assert dp == 6081
        gv = fr[l4 + 8:]
        assert (gv[0] >> 6) == 0 and not (gv[1] & 0x80)
        opt_len = (gv[0] & 0x3F) * 4
        ptype = struct.unpack_from(">H", gv, 2)[0]
        assert ptype == 0x6558
        vni = (gv[4] << 16) | (gv[5] << 8) | gv[6]
        o, nopts = 8, 0
        while o < 8 + opt_len:
            o += 4 + (gv[o + 3] & 0x1F) * 4
            nopts += 1
        assert o == 8 + opt_len
        inner = gv[8 + opt_len:]
        iihl = (inner[14] & 0xF) * 4
        il4 = 14 + iihl
        assert inner[14 + 9] == 17
        dns = inner[il4 + 8:]
        flags = struct.unpack_from(">H", dns, 2)[0]
        nx = 1 if (flags & 0xF) == 3 else 0
        labels, p = [], 12
        while dns[p] != 0:
            ln = dns[p]
            labels.append(dns[p + 1:p + 1 + ln].decode("ascii"))
            p += 1 + ln
        q = ".".join(labels).lower() + "."
        e = gstats.setdefault(vni, [0, 0, None, 0])
        e[0] += 1
        e[1] += nx
        e[2] = q if e[2] is None else min(e[2], q)
        e[3] = max(e[3], nopts)
    _cmp("pcap_geneve_decap(redecode)",
         _read("pcap_geneve_decap",
               ["vni", "n_pkts", "n_nx", "first_qname", "max_opts"]),
         sorted((v, n, nx, q, mo) for v, (n, nx, q, mo) in gstats.items()))

# SIP sessions: independent text parse of the RFC 3261 subset + the
# per-call rollup (no shared code with Decap.sip).
if glob.glob(f"{out}/pcap_sip_sessions/*.parquet"):
    calls = {}
    for sec, usec, fr in _frames("/tmp/graft_synth_sip.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        dp = struct.unpack_from(">H", fr, l4 + 2)[0]
        assert dp == 5060
        ts = sec * 1000000 + usec
        head = fr[l4 + 8:].decode("latin-1").split("\r\n\r\n")[0]
        lines = head.split("\r\n")
        start = lines[0]
        if start.startswith("SIP/2.0 "):
            status = int(start.split(" ")[1])
        else:
            status = 0

        def hdr(name):
            for l in lines[1:]:
                if l.lower().startswith(name.lower() + ":"):
                    return l[len(name) + 1:].strip()
            return None

        method = start.split(" ")[0] if status == 0 else \
            hdr("CSeq").split(" ")[1]
        cid = hdr("Call-ID")

        def uri(v):
            return v[v.index("<") + 1:v.index(">")] if "<" in v else v

        e = calls.setdefault(cid, {"n": 0, "from": None, "to": None,
                                   "inv": None, "ans": None, "st": None,
                                   "bye": None})
        e["n"] += 1
        e["from"] = uri(hdr("From"))
        e["to"] = uri(hdr("To"))
        if method == "INVITE" and status == 0:
            e["inv"] = ts
        if method == "INVITE" and status > 0:
            e["ans"], e["st"] = ts, status
        if method == "BYE" and status == 0:
            e["bye"] = ts
    exp = sorted(
        (cid, e["from"], e["to"], e["n"], e["st"], e["ans"] - e["inv"],
         (e["bye"] - e["inv"]) if e["bye"] is not None else None)
        for cid, e in calls.items())
    got = _read("pcap_sip_sessions",
                ["call_id", "caller", "callee", "n_msgs", "status_code",
                 "setup_us", "duration_us"])

    # the nullable duration column reads back as float64 (NaN for the
    # busy calls' NULLs) — normalize to int/None before comparing
    def _norm(t):
        return tuple(None if (isinstance(v, float) and v != v)
                     else (int(v) if isinstance(v, float) else v)
                     for v in t)

    _cmp("pcap_sip_sessions(redecode)",
         sorted(_norm(t) for t in got), exp)

# RTP audio level: independent parse of the RTP header + a from-spec
# G.711 expansion (ITU tables re-implemented here, no shared code with
# WavCodec) folded into per-stream level stats.
if glob.glob(f"{out}/pcap_rtp_audio_level/*.parquet"):
    def _ulaw(b):
        u = (~b) & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def _alaw(b):
        a = b ^ 0x55
        seg = (a >> 4) & 0x07
        t = (a & 0x0F) << 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    astats = {}
    for _, _, fr in _frames("/tmp/graft_synth_rtpaudio.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        dp = struct.unpack_from(">H", fr, l4 + 2)[0]
        assert dp == 40002
        rtp = fr[l4 + 8:]
        assert (rtp[0] >> 6) == 2
        pt = rtp[1] & 0x7F
        assert pt in (0, 5, 8)
        ssrc = struct.unpack_from(">I", rtp, 8)[0]
        if pt == 5:
            # DVI4: 4-byte state header + IMA nibbles, HIGH nibble first
            steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23,
                     25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73,
                     80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
                     209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
                     544, 598, 658, 724, 796, 876, 963, 1060, 1166,
                     1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499,
                     2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
                     5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
                     12635, 13899, 15289, 16818, 18500, 20350, 22385,
                     24623, 27086, 29794, 32767]
            idxd = [-1, -1, -1, -1, 2, 4, 6, 8]
            pred = struct.unpack_from(">h", rtp, 12)[0]
            idx = rtp[14]
            pcm = []
            for byte in rtp[16:]:
                for c in (byte >> 4, byte & 0xF):
                    step = steps[idx]
                    diff = step >> 3
                    if c & 1:
                        diff += step >> 2
                    if c & 2:
                        diff += step >> 1
                    if c & 4:
                        diff += step
                    pred = pred - diff if c & 8 else pred + diff
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + idxd[c & 7]))
                    pcm.append(pred)
        else:
            pcm = [(_alaw(b) if pt == 8 else _ulaw(b)) for b in rtp[12:]]
        e = astats.setdefault((ssrc, pt), [0, 0, 0, 0])
        e[0] += 1
        e[1] += len(pcm)
        e[2] = max(e[2], max(abs(v) for v in pcm))
        e[3] += sum(abs(v) for v in pcm)
    _cmp("pcap_rtp_audio_level(redecode)",
         _read("pcap_rtp_audio_level",
               ["ssrc", "pt", "n_pkts", "n_samples", "peak", "sum_abs"]),
         sorted((ss, pt, n, ns, pk, sa)
                for (ss, pt), (n, ns, pk, sa) in astats.items()))

# RTP stream quality: independent parse of the RFC 3550 fixed header
# plus the loss/jitter fold (no shared code with Decap.rtp or the
# Spark window plan — plain per-stream sort + pairwise diff).
if glob.glob(f"{out}/pcap_rtp_quality/*.parquet"):
    streams = {}
    for sec, usec, fr in _frames("/tmp/graft_synth_rtp.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        dp = struct.unpack_from(">H", fr, l4 + 2)[0]
        assert dp == 40000
        rtp = fr[l4 + 8:]
        assert (rtp[0] >> 6) == 2
        pt = rtp[1] & 0x7F
        seq = struct.unpack_from(">H", rtp, 2)[0]
        rts = struct.unpack_from(">I", rtp, 4)[0]
        ssrc = struct.unpack_from(">I", rtp, 8)[0]
        arr = sec * 1000000 + usec
        streams.setdefault(ssrc, []).append((seq, pt, rts * 125, arr))
    rexp = []
    for ssrc, pkts in streams.items():
        pkts.sort()
        ds = [abs((b[3] - a[3]) - (b[2] - a[2]))
              for a, b in zip(pkts, pkts[1:])]
        lost = (pkts[-1][0] - pkts[0][0] + 1) - len(pkts)
        rexp.append((ssrc, max(p[1] for p in pkts), len(pkts), lost,
                     sum(ds), max(ds)))
    _cmp("pcap_rtp_quality(redecode)",
         _read("pcap_rtp_quality",
               ["ssrc", "pt", "n_received", "n_lost", "jitter_sum_us",
                "jitter_max_us"]),
         sorted(rexp))

# 802.1ad QinQ inventory: independent byte-level parse of the tag
# stack (service + optional customer tag) and the DNS behind it.
if glob.glob(f"{out}/pcap_qinq_inventory/*.parquet"):
    qstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_qinq.pcap"):
        et = struct.unpack_from(">H", fr, 12)[0]
        assert et in (0x8100, 0x88A8)
        tci = struct.unpack_from(">H", fr, 14)[0]
        svid = tci & 0xFFF
        et1 = struct.unpack_from(">H", fr, 16)[0]
        if et1 in (0x8100, 0x88A8):
            cvid = struct.unpack_from(">H", fr, 18)[0] & 0xFFF
            ip = 22
        else:
            cvid = None
            ip = 18
        ihl = (fr[ip] & 0xF) * 4
        assert fr[ip + 9] == 17
        src = ".".join(str(b) for b in fr[ip + 12:ip + 16])
        dns = fr[ip + ihl + 8:]
        labels, p = [], 12
        while dns[p] != 0:
            ln = dns[p]
            labels.append(dns[p + 1:p + 1 + ln].decode("ascii"))
            p += 1 + ln
        q = ".".join(labels).lower() + "."
        e = qstats.setdefault((svid, cvid), [0, set(), None])
        e[0] += 1
        e[1].add(src)
        e[2] = q if e[2] is None else min(e[2], q)
    qkey = lambda r: (r[0], -1 if r[1] is None else r[1])
    got_q = _read("pcap_qinq_inventory",
                  ["vlan_id", "vlan_inner_id", "n_pkts", "n_clients",
                   "first_qname"])
    if got_q is not None:  # nullable int reads back as float/NaN
        got_q = sorted(
            ((int(a), None if b != b else int(b), int(c), int(d), e)
             for a, b, c, d, e in got_q), key=qkey)
    _cmp("pcap_qinq_inventory(redecode)", got_q,
         sorted(((sv, cv, n, len(cl), q)
                 for (sv, cv), (n, cl, q) in qstats.items()), key=qkey))

# 802.1Q VLAN inventory: independent byte-level parse of the tag and
# the IP/UDP/DNS behind it (no shared code with FrameDecoder).
if glob.glob(f"{out}/pcap_vlan_inventory/*.parquet"):
    vlstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_vlan.pcap"):
        et = struct.unpack_from(">H", fr, 12)[0]
        if et != 0x8100:
            continue  # untagged frames are filtered by the query
        tci = struct.unpack_from(">H", fr, 14)[0]
        vid, pcp = tci & 0xFFF, tci >> 13
        ip = 18
        ihl = (fr[ip] & 0xF) * 4
        assert fr[ip + 9] == 17
        src = ".".join(str(b) for b in fr[ip + 12:ip + 16])
        dns = fr[ip + ihl + 8:]
        labels, p = [], 12
        while dns[p] != 0:
            ln = dns[p]
            labels.append(dns[p + 1:p + 1 + ln].decode("ascii"))
            p += 1 + ln
        q = ".".join(labels).lower() + "."
        e = vlstats.setdefault(vid, [0, set(), 0, None])
        e[0] += 1
        e[1].add(src)
        e[2] = max(e[2], pcp)
        e[3] = q if e[3] is None else min(e[3], q)
    _cmp("pcap_vlan_inventory(redecode)",
         _read("pcap_vlan_inventory",
               ["vlan_id", "n_pkts", "n_clients", "max_pcp",
                "first_qname"]),
         sorted((v, n, len(cl), mp, q)
                for v, (n, cl, mp, q) in vlstats.items()))

# MPLS inventory: independent RFC 3032 label-stack walk (4-byte
# entries to the bottom-of-stack bit) + inner-IP/DNS re-decode.
if glob.glob(f"{out}/pcap_mpls_inventory/*.parquet"):
    mstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_mpls.pcap"):
        et = struct.unpack_from(">H", fr, 12)[0]
        if et not in (0x8847, 0x8848):
            continue  # plain frames are filtered by the query
        p, labels = 14, []
        while True:
            w = struct.unpack_from(">I", fr, p)[0]
            labels.append(w >> 12)
            p += 4
            if (w >> 8) & 1:
                break
        ip = p
        assert (fr[ip] >> 4) == 4
        ihl = (fr[ip] & 0xF) * 4
        assert fr[ip + 9] == 17
        src = ".".join(str(b) for b in fr[ip + 12:ip + 16])
        dns = fr[ip + ihl + 8:]
        q, _ = parse_qname(dns, 12)
        e = mstats.setdefault((labels[0], len(labels)), [0, set(), None])
        e[0] += 1
        e[1].add(src)
        e[2] = q if e[2] is None else min(e[2], q)
    _cmp("pcap_mpls_inventory(redecode)",
         _read("pcap_mpls_inventory",
               ["outer_label", "depth", "n_pkts", "n_clients",
                "first_qname"]),
         sorted((lbl, d, n, len(cl), q)
                for (lbl, d), (n, cl, q) in mstats.items()))

# JA3S server fingerprint: independent ServerHello parse from raw
# bytes (record/handshake framing, single selected cipher, extension
# walk incl. the ServerHello supported_versions form) + an independent
# md5 of the canonical "legacy,cipher,ext-..." string.
if glob.glob(f"{out}/pcap_tls_ja3s/*.parquet"):
    import hashlib
    jstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_tlssrv.pcap"):
        src, dst, proto, l4 = _v4(fr)
        hdr = ((fr[l4 + 12] >> 4) & 0xF) * 4
        b = fr[l4 + hdr:]
        assert b[0] == 0x16 and b[5] == 0x02
        end = 5 + struct.unpack_from(">H", b, 3)[0]
        p_ = 9
        legacy = struct.unpack_from(">H", b, p_)[0]
        p_ += 34
        p_ += 1 + b[p_]
        cipher = struct.unpack_from(">H", b, p_)[0]
        p_ += 3
        exts, alpn, v13 = [], None, False
        ee_all = p_ + 2 + struct.unpack_from(">H", b, p_)[0]
        assert ee_all == end
        p_ += 2
        while p_ + 4 <= ee_all:
            et = struct.unpack_from(">H", b, p_)[0]
            el = struct.unpack_from(">H", b, p_ + 2)[0]
            p_ += 4
            exts.append(et)
            if et == 43 and el == 2 and \
               struct.unpack_from(">H", b, p_)[0] == 0x0304:
                v13 = True
            p_ += el
        canon = f"{legacy},{cipher}," + "-".join(str(e) for e in exts)
        fp = hashlib.md5(canon.encode()).hexdigest()
        ver = "TLS1.3" if v13 else "TLS1.2"
        e = jstats.setdefault(fp, [0, cipher, ver])
        e[0] += 1
    _cmp("pcap_tls_ja3s(redecode)",
         _read("pcap_tls_ja3s", ["fp", "n_conns", "cipher", "version"]),
         sorted((fp, n, c, v) for fp, (n, c, v) in jstats.items()))

# DHCP server inventory: independent RFC 2131/2132 parse from raw
# bytes (fixed header + magic cookie + option walk; rollup on the
# option-54 server identity over BOOTREPLYs).
if glob.glob(f"{out}/pcap_dhcp_servers/*.parquet"):
    dstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_dhcp.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        sp = struct.unpack_from(">H", fr, l4)[0]
        if sp != 67:
            continue
        pl = fr[l4 + 8:]
        assert pl[236:240] == b"\x63\x82\x53\x63"
        op = pl[0]
        assert op == 2
        hlen = min(pl[2], 16)
        cha = ":".join(f"{b:02x}" for b in pl[28:28 + hlen])
        mt, sid, o = -1, None, 240
        while o < len(pl):
            c = pl[o]
            if c == 255:
                break
            if c == 0:
                o += 1
                continue
            ln = pl[o + 1]
            if c == 53:
                mt = pl[o + 2]
            if c == 54 and ln == 4:
                sid = ".".join(str(b) for b in pl[o + 2:o + 6])
            o += 2 + ln
        if sid is None:
            continue
        e = dstats.setdefault(sid, [0, 0, set()])
        if mt == 2:
            e[0] += 1
        if mt == 5:
            e[1] += 1
        e[2].add(cha)
    _cmp("pcap_dhcp_servers(redecode)",
         _read("pcap_dhcp_servers",
               ["server_id", "n_offers", "n_acks", "n_clients"]),
         sorted((s_, o_, a, len(c)) for s_, (o_, a, c) in dstats.items()))

# ARP conflict inspection: independent RFC 826 parse from raw frame
# bytes (ethertype 0x0806; announcements = oper 2 grouped by claimed
# IP).
if glob.glob(f"{out}/pcap_arp_conflicts/*.parquet"):
    astats = {}
    for _, _, fr in _frames("/tmp/graft_synth_arp.pcap"):
        assert struct.unpack_from(">H", fr, 12)[0] == 0x0806
        o = 14
        assert struct.unpack_from(">HH", fr, o) == (1, 0x0800)
        assert fr[o + 4] == 6 and fr[o + 5] == 4
        oper = struct.unpack_from(">H", fr, o + 6)[0]
        if oper != 2:
            continue
        sha = ":".join(f"{b:02x}" for b in fr[o + 8:o + 14])
        spa = ".".join(str(b) for b in fr[o + 14:o + 18])
        e = astats.setdefault(spa, [0, set()])
        e[0] += 1
        e[1].add(sha)
    _cmp("pcap_arp_conflicts(redecode)",
         _read("pcap_arp_conflicts",
               ["claimed_ip", "n_ann", "n_macs", "first_mac", "conflict"]),
         sorted((ip, n, len(m), min(m), len(m) >= 2)
                for ip, (n, m) in astats.items()))

# ICMPv6/NDP summary: independent parse of the v6 NH-58 path from raw
# bytes (type/code at the fixed 40-byte v6 header end; no ext chain in
# the fixture).
if glob.glob(f"{out}/pcap_icmpv6_summary/*.parquet"):
    istats = {}
    for _, _, fr in _frames("/tmp/graft_synth_icmpv6.pcap"):
        assert struct.unpack_from(">H", fr, 12)[0] == 0x86DD
        assert fr[14 + 6] == 58
        src6 = bytes(fr[14 + 8:14 + 24])
        t, c = fr[14 + 40], fr[14 + 41]
        e = istats.setdefault((t, c), [0, set()])
        e[0] += 1
        e[1].add(src6)
    _cmp("pcap_icmpv6_summary(redecode)",
         _read("pcap_icmpv6_summary",
               ["icmp_type", "icmp_code", "n", "n_src"]),
         sorted((t, c, n, len(s)) for (t, c), (n, s) in istats.items()))

# IP-in-IP / 6in4 decap: RFC 2003 / RFC 4213 — no shim header, the
# outer protocol-4/41 payload IS the inner packet; independent parse
# of both inner versions from raw bytes (no shared code with Decap).
if glob.glob(f"{out}/pcap_ipip_decap/*.parquet"):
    def _qname(dns):
        labels, p = [], 12
        while dns[p] != 0:
            ln = dns[p]
            labels.append(dns[p + 1:p + 1 + ln].decode("ascii"))
            p += 1 + ln
        return ".".join(labels).lower() + "."
    tstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_ipip.pcap"):
        src, dst, proto, l3p = _v4(fr)
        assert proto in (4, 41)
        inner = fr[l3p:]
        v = (inner[0] >> 4) & 0xF
        assert v == (4 if proto == 4 else 6)
        if v == 4:
            iihl = (inner[0] & 0xF) * 4
            assert inner[9] == 17
            client = inner[16:20]
            dns = inner[iihl + 8:]
        else:
            assert inner[6] == 17  # next header straight to UDP
            client = inner[24:40]
            dns = inner[48:]
        fl = struct.unpack_from(">H", dns, 2)[0]
        nx = 1 if (fl & 0xF) == 3 else 0
        q = _qname(dns)
        e = tstats.setdefault(v, [0, set(), 0, None])
        e[0] += 1
        e[1].add(bytes(client))
        e[2] += nx
        e[3] = q if e[3] is None else min(e[3], q)
    _cmp("pcap_ipip_decap(redecode)",
         _read("pcap_ipip_decap",
               ["inner_v", "n_pkts", "n_clients", "n_nx", "first_qname"]),
         sorted((v, n, len(cl), nx, q)
                for v, (n, cl, nx, q) in tstats.items()))

# GRE decap: RFC 2784/2890 — outer protocol 47, optional C/K/S words,
# inner RAW IPv4 (no Ethernet).
if glob.glob(f"{out}/pcap_gre_decap/*.parquet"):
    gstats = {}
    for _, _, fr in _frames("/tmp/graft_synth_gre.pcap"):
        src, dst, proto, l3p = _v4(fr)
        assert proto == 47
        gre = fr[l3p:]
        flags = struct.unpack_from(">H", gre, 0)[0]
        assert (flags & 0x7) == 0
        off = 4
        if flags & 0x8000:
            off += 4
        key = 0
        if flags & 0x2000:
            key = struct.unpack_from(">I", gre, off)[0]
            off += 4
        if flags & 0x1000:
            off += 4
        inner = gre[off:]
        iihl = (inner[0] & 0xF) * 4
        assert inner[9] == 17
        dns = inner[iihl + 8:]
        fl = struct.unpack_from(">H", dns, 2)[0]
        nx = 1 if (fl & 0xF) == 3 else 0
        labels, p = [], 12
        while dns[p] != 0:
            ln = dns[p]
            labels.append(dns[p + 1:p + 1 + ln].decode("ascii"))
            p += 1 + ln
        q = ".".join(labels).lower() + "."
        e = gstats.setdefault(key, [0, 0, None])
        e[0] += 1
        e[1] += nx
        e[2] = q if e[2] is None else min(e[2], q)
    _cmp("pcap_gre_decap(redecode)",
         _read("pcap_gre_decap", ["key", "n_pkts", "n_nx", "first_qname"]),
         sorted((k, n, nx, q) for k, (n, nx, q) in gstats.items()))

# Beaconing detection: byte-level re-decode of the beacon capture,
# per-flow gap sweep + the same integer CV²-in-basis-points rule.
if glob.glob(f"{out}/pcap_beacon_candidates/*.parquet"):
    btimes = {}
    for ts, us, fr in _frames("/tmp/graft_synth_beacon.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        sp, dp = struct.unpack_from(">HH", fr, l4)
        btimes.setdefault((src, dst, dp), []).append(ts * 1_000_000 + us)
    bexp = []
    for (src, dst, dp), tt in btimes.items():
        tt.sort()
        gaps = [(b - a) // 1000 for a, b in zip(tt, tt[1:])]
        n = len(gaps)
        if n < 8:
            continue
        s1, s2 = sum(gaps), sum(g * g for g in gaps)
        cv2 = (n * s2 - s1 * s1) * 10000 // (s1 * s1)
        bexp.append((src, dst, dp, n + 1, s1 // n, cv2, cv2 <= 100))
    _cmp("pcap_beacon_candidates(redecode)",
         _read("pcap_beacon_candidates",
               ["src", "dst", "dst_port", "n_pkts", "period_ms",
                "cv2_bp", "is_beacon"]),
         sorted(bexp))

# Passive DNS: byte-level walk of the answer section (incl. compression
# pointers) -> (rrname, rrtype, rdata) observation rollup.
def _dns_name_at(d, off):
    parts = []
    while True:
        ln = d[off]
        if ln == 0:
            off += 1
            break
        if ln & 0xC0 == 0xC0:
            ptr = ((ln & 0x3F) << 8) | d[off + 1]
            off += 2
            sub, _ = _dns_name_at(d, ptr)
            parts.append(sub.rstrip("."))
            return ".".join(parts) + ".", off
        parts.append(d[off + 1:off + 1 + ln].decode("ascii"))
        off += 1 + ln
    return ".".join(parts) + ".", off

if glob.glob(f"{out}/pcap_passive_dns/*.parquet"):
    TYPES = {1: "A", 5: "CNAME", 28: "AAAA"}
    pdns = {}
    for ts, us, fr in _frames("/tmp/graft_synth_pdns.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        dns = fr[l4 + 8:]
        qd, an = struct.unpack_from(">HH", dns, 4)
        off = 12
        for _ in range(qd):
            _, off = _dns_name_at(dns, off)
            off += 4
        for _ in range(an):
            nm, off = _dns_name_at(dns, off)
            t, cls, rttl, rdlen = struct.unpack_from(">HHIH", dns, off)
            off += 10
            rd = dns[off:off + rdlen]
            off += rdlen
            if t == 1:
                rds = ".".join(str(b) for b in rd)
            else:
                rds, _ = _dns_name_at(dns, off - rdlen)
            e = pdns.setdefault((nm, TYPES[t], rds), [0, ts, ts])
            e[0] += 1
            e[1] = min(e[1], ts)
            e[2] = max(e[2], ts)
    _cmp("pcap_passive_dns(redecode)",
         _read("pcap_passive_dns",
               ["rrname", "rrtype", "rdata", "n_obs", "first_seen",
                "last_seen"]),
         sorted((nm, t, rd, c, f, l)
                for (nm, t, rd), (c, f, l) in pdns.items()))

# Passive OS fingerprinting: SYN-only sweep, initial-TTL rounding +
# (initial_ttl, window) signature table.
if glob.glob(f"{out}/pcap_os_fingerprint/*.parquet"):
    SIGS = {(64, 29200): "linux", (128, 64240): "windows",
            (64, 65535): "macos", (255, 8192): "embedded"}
    osacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_ossyn.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 6
        if _flags(fr, l4) != "SYN":
            continue
        ttl = fr[14 + 8]
        win = struct.unpack_from(">H", fr, l4 + 14)[0]
        init = 32 if ttl <= 32 else 64 if ttl <= 64 else \
            128 if ttl <= 128 else 255
        os_guess = SIGS.get((init, win), "unknown")
        e = osacc.setdefault((os_guess, init, win), [0, set(), 0])
        e[0] += 1
        e[1].add(src)
        e[2] = max(e[2], init - ttl)
    _cmp("pcap_os_fingerprint(redecode)",
         _read("pcap_os_fingerprint",
               ["os_guess", "initial_ttl", "tcp_window", "n_syn",
                "n_hosts", "max_hops"]),
         sorted((g, t, w, c, len(hs), mh)
                for (g, t, w), (c, hs, mh) in osacc.items()))

# SSH inventory: byte-level TCP parse, server-side (src port 22)
# banner prefix match, (server, banner) rollup.
if glob.glob(f"{out}/pcap_ssh_inventory/*.parquet"):
    sshacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_ssh.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 6
        sp = struct.unpack_from(">H", fr, l4)[0]
        if sp != 22:
            continue
        doff = (fr[l4 + 12] >> 4) * 4
        pl = fr[l4 + doff:]
        if not pl.startswith(b"SSH-"):
            continue
        banner = pl.split(b"\r")[0].split(b"\n")[0].decode("ascii")
        e = sshacc.setdefault((src, banner), [0, set()])
        e[0] += 1
        e[1].add(dst)
    _cmp("pcap_ssh_inventory(redecode)",
         _read("pcap_ssh_inventory",
               ["server", "banner", "n_banners", "n_clients",
                "is_legacy"]),
         sorted((s, b, c, len(ds), not b.startswith("SSH-2.0"))
                for (s, b), (c, ds) in sshacc.items()))

# NTP amplification: byte-level UDP parse, port-derived direction,
# first-byte mode, per-(server, client) byte rollup + ratio.
if glob.glob(f"{out}/pcap_ntp_amplification/*.parquet"):
    ntpacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_ntp.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        sp, dp = struct.unpack_from(">HH", fr, l4)
        if sp != 123 and dp != 123:
            continue
        pl = fr[l4 + 8:]
        resp = sp == 123
        server, client = (src, dst) if resp else (dst, src)
        e = ntpacc.setdefault((server, client), [0, 0, 0, 0, 0])
        e[0 if not resp else 1] += 1
        e[2 if not resp else 3] += len(pl)
        if pl and pl[0] % 8 == 7:
            e[4] += 1
    _cmp("pcap_ntp_amplification(redecode)",
         _read("pcap_ntp_amplification",
               ["server", "client", "req_pkts", "resp_pkts",
                "req_bytes", "resp_bytes", "n_mode7", "amp_x10",
                "amplified"]),
         sorted((s, c, rq, rs, rqb, rsb, m7,
                 rsb * 10 // max(rqb, 1), rsb * 10 // max(rqb, 1) >= 100)
                for (s, c), (rq, rs, rqb, rsb, m7) in ntpacc.items()))

# capinfos: per-file packet count / time bounds / byte volume / rate
# from the raw container alone.
if glob.glob(f"{out}/pcap_capinfos/*.parquet"):
    cstats = []
    for p in sorted(glob.glob("/tmp/graft_synth_capdir/*.pcap")):
        tss, tot = [], 0
        for ts, us, fr in _frames(p):
            tss.append(ts * 1_000_000 + us)
            tot += len(fr)
        first, last = min(tss), max(tss)
        cstats.append((p.split("/")[-1], len(tss), first, last, tot,
                       (last - first) // 1_000_000,
                       tot * 1_000_000 // max(last - first, 1)))
    _cmp("pcap_capinfos(redecode)",
         _read("pcap_capinfos",
               ["file_name", "n_pkts", "first_ts", "last_ts",
                "total_bytes", "duration_s", "rate_bps"]),
         sorted(cstats))

# DNS typosquat: byte-level qname parse from the query packets, this
# tool's OWN DP edit distance (never Spark's levenshtein), allowlist
# match re-applied (dist <= 2, not exact).
if glob.glob(f"{out}/pcap_dns_typosquat/*.parquet"):
    POPULAR = ["google.com", "facebook.com", "paypal.com",
               "microsoft.com", "netflix.com", "amazon.com",
               "apple.com", "github.com"]
    def _ed(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]
    tacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_typodns.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        if struct.unpack_from(">H", fr, l4 + 2)[0] != 53:
            continue
        dns = fr[l4 + 8:]
        if dns[2] & 0x80:                     # responses excluded
            continue
        o, labels = 12, []
        while dns[o]:
            labels.append(dns[o + 1:o + 1 + dns[o]].decode("ascii"))
            o += 1 + dns[o]
        qname = ".".join(labels).lower()
        e = tacc.setdefault(qname, [0, set()])
        e[0] += 1
        e[1].add(src)
    _cmp("pcap_dns_typosquat(redecode)",
         _read("pcap_dns_typosquat",
               ["domain", "popular", "edit_dist", "n_queries",
                "n_clients"]),
         sorted((d, p, _ed(d, p), c, len(cs))
                for d, (c, cs) in tacc.items()
                for p in POPULAR if d != p and _ed(d, p) <= 2))

# Fast-flux: byte-level DNS answer-section walk (compression pointer
# following, TTL field), per-rrname IP/subnet/TTL rollup, flag rule
# re-applied (n_ips >= 10 and n_subnets >= 5 and max_ttl <= 300).
if glob.glob(f"{out}/pcap_dns_fastflux/*.parquet"):
    def _name_at(dns, o):
        labels = []
        while True:
            l = dns[o]
            if l == 0:
                break
            if l & 0xC0 == 0xC0:
                o = ((l & 0x3F) << 8) | dns[o + 1]
                continue
            labels.append(dns[o + 1:o + 1 + l].decode("ascii"))
            o += 1 + l
        return ".".join(labels) + "."
    ffacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_fastflux.pcap"):
        src, dst, proto, l4 = _v4(fr)
        assert proto == 17
        if struct.unpack_from(">H", fr, l4)[0] != 53:
            continue
        dns = fr[l4 + 8:]
        ancount = struct.unpack_from(">H", dns, 6)[0]
        o = 12
        while dns[o]:                          # skip the question name
            o += 1 + dns[o]
        o += 1 + 4
        for _ in range(ancount):
            name = _name_at(dns, o)
            while dns[o] and dns[o] & 0xC0 != 0xC0:
                o += 1 + dns[o]
            o += 2 if dns[o] & 0xC0 == 0xC0 else 1
            typ, _cls, ttl, rdlen = struct.unpack_from(">HHIH", dns, o)
            o += 10
            rdata = dns[o:o + rdlen]; o += rdlen
            if typ != 1:
                continue
            ip = ".".join(str(b) for b in rdata)
            e = ffacc.setdefault(name, [0, set(), set(), None, None])
            e[0] += 1
            e[1].add(ip)
            e[2].add(ip.rsplit(".", 1)[0])
            e[3] = ttl if e[3] is None else min(e[3], ttl)
            e[4] = ttl if e[4] is None else max(e[4], ttl)
    _cmp("pcap_dns_fastflux(redecode)",
         _read("pcap_dns_fastflux",
               ["rrname", "n_obs", "n_ips", "n_subnets", "min_ttl",
                "max_ttl", "fastflux"]),
         sorted((nm, c, len(ips), len(sns), mn, mx,
                 len(ips) >= 10 and len(sns) >= 5 and mx <= 300)
                for nm, (c, ips, sns, mn, mx) in ffacc.items()))

# Cleartext credentials: byte-level TCP parse, case-insensitive HTTP
# Basic header match + base64 user recovery, FTP USER/PASS commands,
# per-(proto, server) rollup.
if glob.glob(f"{out}/pcap_cleartext_creds/*.parquet"):
    import base64, re
    basic_re = re.compile(
        rb"\r\nauthorization:[ \t]*Basic[ \t]+([A-Za-z0-9+/=]+)[ \t]*\r\n",
        re.IGNORECASE)
    cracc = {}
    def _cradd(proto, server, user, client):
        e = cracc.setdefault((proto, server), [0, set(), set()])
        e[0] += 1
        if user is not None:
            e[1].add(user)
        e[2].add(client)
    for ts, us, fr in _frames("/tmp/graft_synth_creds.pcap"):
        src, dst, proto, l4 = _v4(fr)
        if proto != 6:
            continue
        dp = struct.unpack_from(">H", fr, l4 + 2)[0]
        doff = (fr[l4 + 12] >> 4) * 4
        pl = fr[l4 + doff:]
        if dp == 80:
            m = basic_re.search(pl)
            if m:
                user = base64.b64decode(m.group(1)).split(b":")[0]
                _cradd("http-basic", dst, user.decode("ascii"), src)
        elif dp == 21 and (pl.startswith(b"USER ")
                           or pl.startswith(b"PASS ")):
            user = (pl[5:].split()[0].decode("ascii")
                    if pl.startswith(b"USER ") else None)
            _cradd("ftp", dst, user, src)
    _cmp("pcap_cleartext_creds(redecode)",
         _read("pcap_cleartext_creds",
               ["proto", "server", "n_creds", "n_users", "n_clients"]),
         sorted((p, sv, c, len(us), len(cs))
                for (p, sv), (c, us, cs) in cracc.items()))

# TLS certificate inventory: byte-level reassembly of each server's
# 443 flight, TLS record walk, own minimal ASN.1/DER reader (no shared
# code with the Scala parser), per-(server, cert) rollup.
if glob.glob(f"{out}/pcap_tls_certs/*.parquet"):
    def _der(b, p, end):
        """tag, content_start, content_end (definite lengths only)."""
        tag = b[p]
        q = p + 1
        ln = b[q]; q += 1
        if ln >= 0x80:
            n = ln & 0x7F
            assert 1 <= n <= 3
            ln = int.from_bytes(b[q:q + n], "big"); q += n
        assert q + ln <= end
        return tag, q, q + ln

    def _der_cn(b, frm, to):
        p = frm
        while p < to:
            tag, s0, s1 = _der(b, p, to)
            if tag == 0x31:
                q = s0
                while q < s1:
                    t2, a0, a1 = _der(b, q, s1)
                    if t2 == 0x30:
                        t3, o0, o1 = _der(b, a0, a1)
                        if t3 == 0x06 and b[o0:o1] == b"\x55\x04\x03":
                            t4, v0, v1 = _der(b, o1, a1)
                            return b[v0:v1].decode("ascii")
                    q = a1
            p = s1
        return None

    def _der_time(b, tag, v0, v1):
        import calendar, time as _t
        s = b[v0:v1].decode("ascii")
        if tag == 0x17:
            yy = int(s[:2])
            year = 2000 + yy if yy < 50 else 1900 + yy
            rest = s[2:12]
        else:
            year, rest = int(s[:4]), s[4:14]
        return calendar.timegm((year, int(rest[0:2]), int(rest[2:4]),
                                int(rest[4:6]), int(rest[6:8]),
                                int(rest[8:10]), 0, 0, 0))

    def _parse_cert(b, frm, to):
        _, c0, c1 = _der(b, frm, to)
        _, t0, t1 = _der(b, c0, c1)          # tbsCertificate
        p = t0
        tag, v0, v1 = _der(b, p, t1)
        if tag == 0xA0:
            p = v1
        tag, s0, s1 = _der(b, p, t1)         # serial
        serial = int.from_bytes(b[s1 - min(8, s1 - s0):s1], "big") & (2**63 - 1)
        p = s1
        tag, a0, a1 = _der(b, p, t1); p = a1          # sig alg
        tag, i0, i1 = _der(b, p, t1)                  # issuer
        issuer_cn, issuer_der = _der_cn(b, i0, i1), b[i0:i1]
        p = i1
        tag, vv0, vv1 = _der(b, p, t1)                # validity
        tb, b0, b1 = _der(b, vv0, vv1)
        ta, e0, e1 = _der(b, b1, vv1)
        nbf, naf = _der_time(b, tb, b0, b1), _der_time(b, ta, e0, e1)
        p = vv1
        tag, u0, u1 = _der(b, p, t1)                  # subject
        subject_cn, subject_der = _der_cn(b, u0, u1), b[u0:u1]
        p = u1
        tag, k0, k1 = _der(b, p, t1); p = k1          # SPKI
        san = 0
        while p < t1:
            tag, x0, x1 = _der(b, p, t1)
            if tag == 0xA3:
                _, q0, q1 = _der(b, x0, x1)
                q = q0
                while q < q1:
                    te, e2, e3 = _der(b, q, q1)
                    t5, o0, o1 = _der(b, e2, e3)
                    if t5 == 0x06 and b[o0:o1] == b"\x55\x1d\x11":
                        t6, w0, w1 = _der(b, o1, e3)
                        if t6 == 0x01:
                            t6, w0, w1 = _der(b, w1, e3)
                        _, g0, g1 = _der(b, w0, w1)
                        g = g0
                        while g < g1:
                            t7, h0, h1 = _der(b, g, g1)
                            if t7 == 0x82:
                                san += 1
                            g = h1
                    q = e3
            p = x1
        return (serial, subject_cn, issuer_cn, nbf, naf, san,
                issuer_der == subject_der)

    streams = {}
    for ts, us, fr in _frames("/tmp/graft_synth_tlscert.pcap"):
        src, dst, proto, l4 = _v4(fr)
        if proto != 6:
            continue
        sp = struct.unpack_from(">H", fr, l4)[0]
        if sp != 443:
            continue
        seq = struct.unpack_from(">I", fr, l4 + 4)[0]
        doff = (fr[l4 + 12] >> 4) * 4
        pl = fr[l4 + doff:]
        if pl:
            streams.setdefault((src, dst, sp), {})[seq] = pl
    certacc = {}
    for (src, dst, sp), segs in streams.items():
        flight = b"".join(segs[s] for s in sorted(segs))
        # TLS record walk -> handshake byte stream -> Certificate msg
        hs, p = b"", 0
        while p + 5 <= len(flight) and flight[p] == 0x16:
            rl = struct.unpack_from(">H", flight, p + 3)[0]
            hs += flight[p + 5:p + 5 + rl]
            p += 5 + rl
        q = 0
        while q + 4 <= len(hs):
            mt = hs[q]
            ml = int.from_bytes(hs[q + 1:q + 4], "big")
            if mt == 11:
                cl = int.from_bytes(hs[q + 7:q + 10], "big")
                cert = _parse_cert(hs, q + 10, q + 10 + cl)
                key = (src,) + cert
                certacc[key] = certacc.get(key, 0) + 1
                break
            q += 4 + ml
    _cmp("pcap_tls_certs(redecode)",
         _read("pcap_tls_certs",
               ["server", "serial", "subject_cn", "issuer_cn",
                "not_before", "not_after", "san_count", "self_signed",
                "n_sessions", "expired"]),
         sorted((sv, ser, scn, icn, nbf, naf, san, ss, cnt,
                 naf < 1706100000)
                for (sv, ser, scn, icn, nbf, naf, san, ss), cnt
                in certacc.items()))

# QUIC inventory: byte-level UDP parse of the RFC 8999 invariant
# long-header prefix (form bit, version, DCID length).
if glob.glob(f"{out}/pcap_quic_inventory/*.parquet"):
    VN = {1: "v1", 0x6B3343CF: "v2", 0xFF00001D: "draft-29",
          0: "negotiation"}
    qacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_quic.pcap"):
        src, dst, proto, l4 = _v4(fr)
        if proto != 17:
            continue
        sp, dp = struct.unpack_from(">HH", fr, l4)
        if sp != 443 and dp != 443:
            continue
        pl = fr[l4 + 8:]
        if len(pl) < 7 or not pl[0] & 0x80:
            continue
        ver = struct.unpack_from(">I", pl, 1)[0]
        server, client = (dst, src) if dp == 443 else (src, dst)
        name = VN.get(ver, "unknown")
        e = qacc.setdefault((server, name), [0, set(), 0])
        e[0] += 1
        e[1].add(client)
        e[2] = max(e[2], pl[5])
    _cmp("pcap_quic_inventory(redecode)",
         _read("pcap_quic_inventory",
               ["server", "version_name", "n_pkts", "n_clients",
                "max_dcid_len", "is_negotiation"]),
         sorted((sv, nm, c, len(cl), mx, nm == "negotiation")
                for (sv, nm), (c, cl, mx) in qacc.items()))

# SMTP audit: byte-level per-session fold over the command stream,
# then the (server, sender domain) rollup.
if glob.glob(f"{out}/pcap_smtp_audit/*.parquet"):
    import re as _re
    mail_re = _re.compile(rb"^MAIL FROM:<([^>]*)>")
    sess = {}
    for ts, us, fr in _frames("/tmp/graft_synth_smtp.pcap"):
        src, dst, proto, l4 = _v4(fr)
        if proto != 6:
            continue
        sp, dp = struct.unpack_from(">HH", fr, l4)
        if dp != 25:
            continue
        doff = (fr[l4 + 12] >> 4) * 4
        pl = fr[l4 + doff:]
        e = sess.setdefault((src, dst, sp), [None, 0, 0, 0])
        m = mail_re.match(pl)
        if m:
            e[0] = m.group(1).decode("ascii")
        elif pl.startswith(b"RCPT TO:"):
            e[1] += 1
        elif pl == b"STARTTLS\r\n":
            e[2] = 1
        elif pl == b"AUTH LOGIN\r\n":
            e[3] = 1
    sacc = {}
    for (src, dst, sp), (sender, rc, st, au) in sess.items():
        if not sender:
            continue
        dom = sender.split("@")[-1]
        e = sacc.setdefault((dst, dom), [0, 0, 0, 0])
        e[0] += 1; e[1] += rc; e[2] += st; e[3] += au
    _cmp("pcap_smtp_audit(redecode)",
         _read("pcap_smtp_audit",
               ["server", "sender_domain", "n_sessions", "n_rcpts",
                "n_starttls", "n_plain_auth", "cleartext_exposed"]),
         sorted((sv, dom, se, rc, st, au, st < se)
                for (sv, dom), (se, rc, st, au) in sacc.items()))

# DGA candidates: byte-level qname + rcode parse, per-client fold.
if glob.glob(f"{out}/pcap_dga_candidates/*.parquet"):
    dacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_dga2.pcap"):
        src, dst, proto, l4 = _v4(fr)
        if proto != 17:
            continue
        sp, dp = struct.unpack_from(">HH", fr, l4)
        if sp != 53 and dp != 53:
            continue
        dns = fr[l4 + 8:]
        flags = struct.unpack_from(">H", dns, 2)[0]
        # first label of the question name
        lab_len = dns[12]
        sld = dns[13:13 + lab_len].decode("ascii")
        client = src if dp == 53 else dst
        e = dacc.setdefault(client, [0, 0, 0, 0, 0])
        if dp == 53:
            e[0] += 1
            e[3] += len(sld)
            e[4] += sum(c.isdigit() for c in sld)
        else:
            e[1] += 1
            if flags & 0xF == 3:
                e[2] += 1
    _cmp("pcap_dga_candidates(redecode)",
         _read("pcap_dga_candidates",
               ["client", "n_queries", "n_responses", "n_nxdomain",
                "sum_sld_len", "sum_sld_digits", "dga_flag"]),
         sorted((c, q, r, x, sl, sd,
                 q >= 10 and x * 10 >= r * 6 and sd * 100 >= sl * 15)
                for c, (q, r, x, sl, sd) in dacc.items()))

# TTL path-stability: byte-level IPv4 parse, per-(src,dst) rollup of
# TTL diversity, initial-TTL-class mixing, and hop spread — UDP only
# (the ICMP echoes in the fixture must be excluded).
if glob.glob(f"{out}/pcap_ttl_path/*.parquet"):
    tacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_ttlpath.pcap"):
        src, dst, proto, l4 = _v4(fr)
        if proto != 17:
            continue
        ttl = fr[14 + 8]
        init = 32 if ttl <= 32 else 64 if ttl <= 64 else \
            128 if ttl <= 128 else 255
        e = tacc.setdefault((src, dst), [0, set(), set(), []])
        e[0] += 1
        e[1].add(ttl)
        e[2].add(init)
        e[3].append(init - ttl)
    _cmp("pcap_ttl_path(redecode)",
         _read("pcap_ttl_path",
               ["src", "dst", "n_pkts", "n_ttls", "n_classes",
                "min_hops", "max_hops", "path_change", "spoof_suspect"]),
         sorted((s_, d_, n, len(tt), len(cl), min(hp), max(hp),
                 len(cl) == 1 and max(hp) - min(hp) >= 3, len(cl) > 1)
                for (s_, d_), (n, tt, cl, hp) in tacc.items()))

# Exfil candidates: byte-level UDP parse, RFC1918-side direction split,
# per-(host, ext) byte rollup + the allowlist/asymmetry rule.
if glob.glob(f"{out}/pcap_exfil_candidates/*.parquet"):
    ALLOW = {"192.0.2.10", "192.0.2.11"}
    eacc = {}
    for ts, us, fr in _frames("/tmp/graft_synth_exfil.pcap"):
        src, dst, proto, l4 = _v4(fr)
        if proto != 17:
            continue
        plen = struct.unpack_from(">H", fr, l4 + 4)[0] - 8
        if plen <= 0:
            continue
        up = src.startswith("10.")
        host, ext = (src, dst) if up else (dst, src)
        e = eacc.setdefault((ext, host), [0, 0, 0])
        e[0] += plen if up else 0
        e[1] += 0 if up else plen
        e[2] += 1
    _cmp("pcap_exfil_candidates(redecode)",
         _read("pcap_exfil_candidates",
               ["ext", "host", "bytes_out", "bytes_in", "n_pkts",
                "allowlisted", "upload_heavy", "exfil_candidate"]),
         sorted((x, h, bo, bi, n, x in ALLOW,
                 bo >= 5 * bi and bo >= 10000,
                 bo >= 5 * bi and bo >= 10000 and x not in ALLOW)
                for (x, h), (bo, bi, n) in eacc.items()))

# Flow size histogram: byte-level per-5-tuple byte totals over BOTH
# captures, folded into floor(log2(bytes)) buckets.
if glob.glob(f"{out}/pcap_flow_size_histogram/*.parquet"):
    facc = {}
    for path in ("/tmp/graft_synth_flowexport.pcap",
                 "/tmp/graft_synth_exfil.pcap"):
        for ts, us, fr in _frames(path):
            src, dst, proto, l4 = _v4(fr)
            if proto != 17:
                continue
            sp, dp = struct.unpack_from(">HH", fr, l4)
            e = facc.setdefault((src, dst, sp, dp), [0, 0])
            e[0] += len(fr)
            e[1] += 1
    hacc = {}
    for (b, p) in facc.values():
        k = b.bit_length() - 1
        e = hacc.setdefault(k, [0, 0, 0])
        e[0] += 1
        e[1] += b
        e[2] += p
    _cmp("pcap_flow_size_histogram(redecode)",
         _read("pcap_flow_size_histogram",
               ["bucket", "n_flows", "sum_bytes", "sum_pkts"]),
         sorted((k, f, b, p) for k, (f, b, p) in hacc.items()))

# Passive traceroute: byte-level ICMP type-11 quote parse (quoted dst
# IP + quoted UDP dst_port -> hop), path join, type-3 completion.
if glob.glob(f"{out}/pcap_passive_traceroute/*.parquet"):
    tr = {}
    done = set()
    for ts, us, fr in _frames("/tmp/graft_synth_traceroute.pcap"):
        src, dst, proto, l4 = _v4(fr)
        if proto != 1:
            continue
        t_, c_ = fr[l4], fr[l4 + 1]
        pl = fr[l4 + 8:]
        if t_ == 11 and c_ == 0:
            qdst = ".".join(str(b) for b in pl[16:20])
            dport = struct.unpack_from(">H", pl, 22)[0]
            tr.setdefault((dst, qdst), []).append(
                (dport - 33434, src))
        elif t_ == 3 and c_ == 3:
            done.add((dst, src))
    _cmp("pcap_passive_traceroute(redecode)",
         _read("pcap_passive_traceroute",
               ["prober", "target", "n_hops_seen", "last_hop",
                "reached", "path"]),
         sorted((p, t_, len(hs), max(h for h, _ in hs),
                 (p, t_) in done,
                 ">".join(r for _, r in sorted(hs)))
                for (p, t_), hs in tr.items()))

# Capture gaps: byte-level timestamp walk, gaps over 1 s.
if glob.glob(f"{out}/pcap_capture_gaps/*.parquet"):
    gaps = []
    prev = None
    for ts, us, fr in _frames("/tmp/graft_synth_gaps.pcap"):
        t = ts * 1_000_000 + us
        if prev is not None and t - prev > 1_000_000:
            gaps.append((prev, t - prev))
        prev = t
    _cmp("pcap_capture_gaps(redecode)",
         _read("pcap_capture_gaps", ["gap_start_micro", "gap_micro"]),
         sorted(gaps))

# Decode-depth census: byte-level re-derivation of how deep each frame
# CAN decode (ethertype, header completeness, known L4), independent of
# the decoder's own column semantics.
if glob.glob(f"{out}/pcap_decode_depth_census/*.parquet"):
    dacc2 = {}
    for ts, us, fr in _frames("/tmp/graft_synth_malformed.pcap"):
        et = struct.unpack_from(">H", fr, 12)[0]
        if et not in (0x0800, 0x86DD):
            d = "l2_only"
        elif et == 0x0800 and len(fr) < 14 + 20:
            d = "l3_truncated"
        else:
            proto = fr[14 + 9]
            d = "l4_decoded" if proto in (1, 6, 17, 58) \
                else "l3_unsupported_l4"
        e = dacc2.setdefault(d, [0, 0])
        e[0] += 1
        e[1] += len(fr)
    _cmp("pcap_decode_depth_census(redecode)",
         _read("pcap_decode_depth_census", ["depth", "n", "n_bytes"]),
         sorted((d, c, b) for d, (c, b) in dacc2.items()))

print("independent pcap oracle:", "FAIL" if fails else "PASS")
sys.exit(1 if fails else 0)
