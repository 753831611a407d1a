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

print("independent pcap oracle:", "FAIL" if fails else "PASS")
sys.exit(1 if fails else 0)
