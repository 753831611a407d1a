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

print("independent pcap oracle:", "FAIL" if fails else "PASS")
sys.exit(1 if fails else 0)
