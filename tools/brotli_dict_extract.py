#!/usr/bin/env python3
"""Extract the RFC 7932 Appendix A/B spec data (static dictionary,
word transforms, literal-context lookup tables) from the local
libbrotlicommon, and emit them as resource files for the clean-room
Scala decoder.

The dictionary bytes, the 121 transforms, and the 2048-byte context
lookup table are PUBLIC SPEC DATA — printed in full in RFC 7932
appendices A/B and §7.1. This script only sources those public bytes
from a local library (no network in this environment); nothing about
the decoder's structure comes from the library.

Transforms are recovered BLACK-BOX through the exported
BrotliTransformDictionaryWord(): each of the 121 transforms is probed
with two long distinctive words and expressed as
(prefix, elementwise-op, suffix), then re-verified over every probe.

Outputs (src/main/resources/graft/brotli/):
  dictionary.bin    122,784 bytes (Appendix A)
  transforms.tsv    121 lines: <op>\t<prefix-hex>\t<suffix-hex>
  context_lut.bin   2048 bytes (§7.1 lookup tables, modes 0..3)
Plus a JSON sidecar with sanity hashes.
"""
import ctypes, hashlib, json, os, sys

SO = "/root/miniconda/pkgs/libbrotlicommon-1.2.0-h32cd6e7_0/lib/libbrotlicommon.so.1.2.0"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/graft/brotli")

lib = ctypes.CDLL(SO)
lib.BrotliGetDictionary.restype = ctypes.c_void_p
lib.BrotliGetTransforms.restype = ctypes.c_void_p
lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
lib.BrotliTransformDictionaryWord.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
    ctypes.c_void_p, ctypes.c_int]

# ---- dictionary: struct BrotliDictionary {
#        uint8 size_bits_by_length[32]; uint32 offsets_by_length[32];
#        uint32 data_size; const uint8* data; }
dptr = lib.BrotliGetDictionary()
raw = ctypes.string_at(dptr, 32 + 32 * 4 + 8 + 8)
size_bits = list(raw[:32])
offsets = [int.from_bytes(raw[32 + 4 * i:36 + 4 * i], "little")
           for i in range(32)]
data_size = int.from_bytes(raw[160:164], "little")
assert data_size == 122784, f"unexpected dictionary size {data_size}"
(data_ptr,) = ctypes.cast(dptr + 168, ctypes.POINTER(ctypes.c_void_p))[0:1]
dict_bytes = ctypes.string_at(data_ptr, data_size)
# RFC 7932 appendix A structure checks: the published SIZE_BITS table
rfc_size_bits = [0]*4 + [10,10,11,11,10,10,10,10,10,9,9,8,7,7,8,7,7,6,6,5,5]
assert size_bits[:25] == rfc_size_bits, size_bits[:25]
total = 0
for l in range(4, 25):
    assert offsets[l] == total, (l, offsets[l], total)
    total += l << rfc_size_bits[l]
assert total == 122784
assert dict_bytes[:4] == b"time", dict_bytes[:16]  # first 4-letter word

# ---- transforms: black-box recovery through the exported worker
tptr = lib.BrotliGetTransforms()
W1 = b"abcdefghijklmnopqrst"      # 20 distinct lowercase bytes
W2 = b"zyxwvutsrqponmlkjihg"
OPS = (["identity", "ferment_first", "ferment_all"] +
       [f"omit_first_{i}" for i in range(1, 10)] +
       [f"omit_last_{i}" for i in range(1, 10)])

def ferment(b: bytes, all_: bool) -> bytes:
    out = bytearray(b)
    i = 0
    while i < len(out):
        c = out[i]
        if c < 192:
            if ord('a') <= c <= ord('z'):
                out[i] ^= 32
            i += 1
        elif c < 224:
            if i + 1 < len(out):
                out[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < len(out):
                out[i + 2] ^= 5
            i += 3
        if not all_:
            break
    return bytes(out)

def apply_op(op: str, w: bytes) -> bytes:
    if op == "identity":
        return w
    if op == "ferment_first":
        return ferment(w, False)
    if op == "ferment_all":
        return ferment(w, True)
    kind, _, n = op.rpartition("_")
    n = int(n)
    if kind == "omit_first":
        return w[n:] if n <= len(w) else b""
    return w[:-n] if n <= len(w) else b""

def probe(idx: int, w: bytes) -> bytes:
    dst = ctypes.create_string_buffer(len(w) + 64)
    n = lib.BrotliTransformDictionaryWord(dst, w, len(w), tptr, idx)
    return dst.raw[:n]

num_transforms = 121
table = []
for t in range(num_transforms):
    o1, o2 = probe(t, W1), probe(t, W2)
    match = None
    for op in OPS:
        c1, c2 = apply_op(op, W1), apply_op(op, W2)
        i1 = o1.find(c1) if c1 else -1
        i2 = o2.find(c2) if c2 else -1
        if c1 and c2 and i1 >= 0 and i2 >= 0:
            p1, s1 = o1[:i1], o1[i1 + len(c1):]
            p2, s2 = o2[:i2], o2[i2 + len(c2):]
            if p1 == p2 and s1 == s2:
                match = (op, p1, s1)
                break
    assert match, f"transform {t}: unrecognized shape {o1!r} / {o2!r}"
    op, pre, suf = match
    # re-verify on a third, shorter word (exercises omit-to-empty edges)
    w3 = b"Quick1"
    assert probe(t, w3) == pre + apply_op(op, w3) + suf, (t, op)
    table.append((op, pre, suf))

assert table[0] == ("identity", b"", b""), table[0]

# ---- context lookup table (2048 bytes, modes LSB6/MSB6/UTF8/Signed)
lut = ctypes.string_at(
    ctypes.cast(lib._kBrotliContextLookupTable if hasattr(
        lib, "_kBrotliContextLookupTable") else None, ctypes.c_void_p)
    if False else
    ctypes.addressof(ctypes.c_ubyte.in_dll(lib, "_kBrotliContextLookupTable")),
    2048)
# sanity vs the RFC §7.1 closed forms for LSB6 (mode 0) and MSB6 (mode 1)
assert all(lut[p] == (p & 0x3F) for p in range(256))
assert all(lut[256 + p] == 0 for p in range(256))
assert all(lut[512 + p] == (p >> 2) for p in range(256))
assert all(lut[512 + 256 + p] == 0 for p in range(256))

os.makedirs(OUT, exist_ok=True)
with open(os.path.join(OUT, "dictionary.bin"), "wb") as f:
    f.write(dict_bytes)
with open(os.path.join(OUT, "context_lut.bin"), "wb") as f:
    f.write(lut)
with open(os.path.join(OUT, "transforms.tsv"), "w") as f:
    for op, pre, suf in table:
        f.write(f"{op}\t{pre.hex()}\t{suf.hex()}\n")
meta = {
    "dictionary_md5": hashlib.md5(dict_bytes).hexdigest(),
    "context_lut_md5": hashlib.md5(lut).hexdigest(),
    "n_transforms": len(table),
}
print(json.dumps(meta, indent=2))
