#!/usr/bin/env python3
"""Independently decrypt the QUIC client-Initial fixture (no graft code:
header parse, HKDF via the `cryptography` library's own RFC 5869
implementation, AES-ECB header-protection mask, AESGCM open, frame walk,
ClientHello SNI parse — all re-derived here from RFC 9000/9001/9369) and
check the recovered population against the synthesis formulas.

Usage: quic_oracle.py <fixture.pcap> <n>   -> prints QUIC_ORACLE PASS
"""
import hashlib, hmac, struct, sys

from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
from cryptography.hazmat.primitives.ciphers.aead import AESGCM
from cryptography.hazmat.primitives.kdf.hkdf import HKDFExpand

SALT = {1: bytes.fromhex("38762cf7f55934b34d179ae6a4c80cadccbb7f0a"),
        0x6B3343CF: bytes.fromhex("0dede3def700a6db819381be6e269dcbf9bd2ed9")}
PFX = {1: b"quic", 0x6B3343CF: b"quicv2"}
INITIAL_TYPE = {1: 0, 0x6B3343CF: 1}


def expand_label(secret, label, n):
    lab = b"tls13 " + label
    info = n.to_bytes(2, "big") + bytes([len(lab)]) + lab + b"\x00"
    return HKDFExpand(algorithm=hashes.SHA256(), length=n, info=info).derive(secret)


def varint(b, p):
    first = b[p]
    ln = 1 << (first >> 6)
    v = first & 0x3F
    for i in range(1, ln):
        v = (v << 8) | b[p + i]
    return v, p + ln


def open_initial(d):
    """Returns (version, dcid, sni) or None (reject)."""
    if len(d) < 7 or not (d[0] & 0x80) or not (d[0] & 0x40):
        return None
    ver = struct.unpack_from(">I", d, 1)[0]
    if ver not in SALT or ((d[0] >> 4) & 3) != INITIAL_TYPE[ver]:
        return None
    p = 5
    dl = d[p]; p += 1
    dcid = d[p:p + dl]; p += dl
    sl = d[p]; p += 1
    p += sl
    tl, p = varint(d, p)
    p += tl
    length, p = varint(d, p)
    pn_off = p
    if pn_off + length > len(d):
        return None
    initial = hmac.new(SALT[ver], dcid, hashlib.sha256).digest()
    cin = expand_label(initial, b"client in", 32)
    key = expand_label(cin, PFX[ver] + b" key", 16)
    iv = expand_label(cin, PFX[ver] + b" iv", 12)
    hp = expand_label(cin, PFX[ver] + b" hp", 16)
    enc = Cipher(algorithms.AES(hp), modes.ECB()).encryptor()
    mask = enc.update(d[pn_off + 4:pn_off + 20]) + enc.finalize()
    first = d[0] ^ (mask[0] & 0x0F)
    pn_len = (first & 3) + 1
    pn_bytes = bytes(d[pn_off + i] ^ mask[1 + i] for i in range(pn_len))
    pn = int.from_bytes(pn_bytes, "big")
    aad = bytes([first]) + d[1:pn_off] + pn_bytes
    nonce = bytearray(iv)
    for i in range(8):
        nonce[11 - i] ^= (pn >> (8 * i)) & 0xFF
    try:
        pt = AESGCM(key).decrypt(bytes(nonce), d[pn_off + pn_len:pn_off + length], aad)
    except Exception:
        return None
    # frame walk -> CRYPTO reassembly
    segs, p = [], 0
    while p < len(pt):
        t = pt[p]
        if t in (0, 1):
            p += 1
        elif t == 2:
            p += 1
            _, p = varint(pt, p)    # largest acked
            _, p = varint(pt, p)    # ack delay
            rc, p = varint(pt, p)   # range count
            _, p = varint(pt, p)    # first range
            for _ in range(rc):
                _, p = varint(pt, p)
                _, p = varint(pt, p)
        elif t == 6:
            p += 1
            off, p = varint(pt, p)
            ln, p = varint(pt, p)
            segs.append((off, pt[p:p + ln]))
            p += ln
        else:
            return None
    stream = b"".join(s for _, s in sorted(segs))
    # minimal ClientHello SNI parse (RFC 8446 §4.1.2, no record layer)
    if len(stream) < 4 or stream[0] != 1:
        return None
    hs_len = int.from_bytes(stream[1:4], "big")
    ch = stream[4:4 + hs_len]
    q = 34                       # version + random
    q += 1 + ch[q]               # session id
    cs = int.from_bytes(ch[q:q + 2], "big"); q += 2 + cs
    q += 1 + ch[q]               # compression
    ext_end = q + 2 + int.from_bytes(ch[q:q + 2], "big"); q += 2
    sni = None
    while q + 4 <= ext_end:
        et = int.from_bytes(ch[q:q + 2], "big")
        el = int.from_bytes(ch[q + 2:q + 4], "big")
        q += 4
        if et == 0:
            nl = int.from_bytes(ch[q + 3:q + 5], "big")
            sni = ch[q + 5:q + 5 + nl].decode("ascii")
        q += el
    return ver, dcid, sni


def main():
    path, n = sys.argv[1], int(sys.argv[2])
    data = open(path, "rb").read()
    assert struct.unpack_from("<I", data, 0)[0] == 0xA1B2C3D4
    offp, got, rejected = 24, {}, 0
    while offp < len(data):
        _, _, cl, _ = struct.unpack_from("<IIII", data, offp)
        offp += 16
        frame = data[offp:offp + cl]
        offp += cl
        if struct.unpack_from(">H", frame, 12)[0] != 0x0800:
            continue
        ihl = (frame[14] & 0x0F) * 4
        if frame[14 + 9] != 17:
            continue
        dst_port = struct.unpack_from(">H", frame, 14 + ihl + 2)[0]
        if dst_port != 443:
            continue
        udp_len = struct.unpack_from(">H", frame, 14 + ihl + 4)[0]
        payload = frame[14 + ihl + 8:14 + ihl + udp_len]
        r = open_initial(payload)
        if r is None:
            rejected += 1
            continue
        ver, dcid, sni = r
        got.setdefault(sni, []).append(ver)

    tlds = ["com", "org", "net"]
    expect_rejects = len([i for i in range(n) if i % 6 == 0]) + \
        len([i for i in range(n) if i % 4 == 0])
    assert rejected == expect_rejects, (rejected, expect_rejects)
    for f in range(24):
        sni = "host%03d.example.%s" % (f, tlds[f % 3])
        sessions = [i for i in range(n) if i % 24 == f]
        vers = got.pop(sni)
        assert len(vers) == len(sessions), (sni, vers)
        want = 0x6B3343CF if f % 3 == 2 else 1
        assert all(v == want for v in vers), (sni, vers)
    assert not got, got
    print("QUIC_ORACLE PASS n=%d rejected=%d" % (n, rejected))


if __name__ == "__main__":
    main()
