#!/usr/bin/env python3
"""Generate brotli golden fixtures with a REAL encoder (brotlicffi,
driver-side only — the JVM never sees python): deterministic payloads
compressed at encoder qualities that emit static-dictionary references
and UTF8-context models, written as pairs under
src/test/resources/brotli/fuzz/ for BrotliDictSpec to round-trip.

Payload families are chosen to exercise the newly-carried spec data:
  - English/HTML text (dictionary references + transforms at q>=5)
  - UTF-8 multilingual text (UTF8 literal-context mode, ferment on
    multi-byte sequences)
  - structured JSON-ish (punctuation-heavy transform suffixes)
  - binary-ish (Signed context mode)
Seeded RNG; re-running reproduces byte-identical fixtures.
"""
import os, random, hashlib, json
import brotlicffi

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/brotli/fuzz")

WORDS = ("time down life left back code data show only site city open "
         "just like free work text year over body love form book play "
         "live line help home side more word long them view find page "
         "days full head term each area from true mark able upon high "
         "date land news even next case both post used made hand here "
         "what name link blog size base held make main user hold ends "
         "with public private should however development information "
         "available description copyright government the of and").split()

UNICODE = ("статья мира città über façade naïve "
           "日本語 中文 café "
           "Αθήνα séance").split()

def payload(rnd, kind, n):
    if kind == 0:   # English/HTML
        parts = []
        while sum(len(p) for p in parts) < n:
            w = rnd.choice(WORDS)
            f = rnd.random()
            if f < 0.1:
                w = w.capitalize()
            elif f < 0.14:
                w = w.upper()
            parts.append(rnd.choice(["", "<p>", "</p>", '<a href="',
                                     '">', ". ", ", ", " "]) + w)
        return (" ".join(parts)[:n]).encode("utf-8")
    if kind == 1:   # multilingual UTF-8
        parts = []
        while sum(len(p) for p in parts) < n:
            parts.append(rnd.choice(UNICODE + WORDS))
        return (" ".join(parts).encode("utf-8"))[:n]
    if kind == 2:   # JSON-ish
        obj = {rnd.choice(WORDS): [rnd.randint(0, 10**6),
                                   rnd.choice(WORDS),
                                   {"k": rnd.choice(WORDS)}]
               for _ in range(max(1, n // 40))}
        return json.dumps(obj).encode("utf-8")[:n]
    # binary-ish with runs (Signed context mode)
    b = bytearray()
    while len(b) < n:
        v = rnd.randint(0, 255)
        b.extend([v] * rnd.randint(1, 17))
        b.append(rnd.randint(0, 255))
    return bytes(b[:n])

def main():
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(OUT):
        os.unlink(os.path.join(OUT, f))
    rnd = random.Random(7932)
    manifest = []
    i = 0
    for kind in range(4):
        for size in (17, 300, 4000, 20000):
            for quality in (1, 5, 9, 11):
                raw = payload(rnd, kind, size)
                # the small-lgwin variants put real distances past the
                # window edge, exercising the window/dictionary boundary
                for lgwin in ((10, 24) if size == 20000 else (22,)):
                    br = brotlicffi.compress(raw, quality=quality,
                                             lgwin=lgwin)
                    stem = f"{i:03d}"
                    with open(os.path.join(OUT, stem + ".raw"), "wb") as fh:
                        fh.write(raw)
                    with open(os.path.join(OUT, stem + ".br"), "wb") as fh:
                        fh.write(br)
                    manifest.append({
                        "stem": stem, "kind": kind, "size": len(raw),
                        "quality": quality, "lgwin": lgwin,
                        "raw_md5": hashlib.md5(raw).hexdigest()})
                    i += 1
    with open(os.path.join(OUT, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    total = sum(os.path.getsize(os.path.join(OUT, f))
                for f in os.listdir(OUT))
    print(f"{i} fixtures, {total} bytes total")

if __name__ == "__main__":
    main()
