"""Python-side oracles for the three queries whose primitives DuckDB
cannot express (xxhash64; the GPT-2 pre-tokenizer's lookahead regex):
independent recomputation of the full pipeline in pure Python + the
published primitive algorithms, compared by check.py through the same
canonicalization as the DuckDB oracles.

d04_simhash_pairs    xxhash64 = XXH64 (public spec, reimplemented
                     below — the xxhash wheel is not installed) with
                     Spark's seed-chaining over multi-arg calls.
t06_doc_fingerprints RollingHash64 = FNV-offset polynomial mod 2^64,
                     base 1000003 (graft.functions.HashExpressions).
t07_bpe_token_stats  GPT-2 pre-tokenizer pattern via the `regex`
                     module (Python regex is the pattern's native
                     dialect).

(Dev/gate tool only — the Scala library has no Python dependency.)
"""
import pyarrow as pa
import pyarrow.parquet as pq

MASK = (1 << 64) - 1
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc, inp):
    acc = (acc + inp * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge(h, v):
    h ^= _round(0, v)
    return (h * P1 + P4) & MASK


def xxh64(data: bytes, seed: int) -> int:
    """Reference XXH64 (xxhash.com spec) — matches Spark's XXH64."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def spark_xxhash64(args, seed=42):
    """Spark's xxhash64(a, b, ...): running seed over non-null string
    args, each hashed as its UTF-8 bytes."""
    h = seed
    for a in args:
        if a is not None:
            h = xxh64(a.encode("utf-8"), h)
    return h


def _signed64(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def _get(ws, i):
    # Spark GetArrayItem: out-of-bounds AND negative -> NULL (no
    # Python-style wrapping)
    return ws[i] if 0 <= i < len(ws) else None


def d04_simhash_pairs(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    sim = {}
    for doc_id, text in zip(docs.column("doc_id").to_pylist(),
                            docs.column("text").to_pylist()):
        ws = text.split(" ")
        # sequence(0, size(ws)-2): for a 1-word doc Spark yields the
        # DESCENDING sequence [0, -1]
        idxs = range(len(ws) - 1) if len(ws) >= 2 else [0, -1]
        hs = [spark_xxhash64((_get(ws, i), _get(ws, i + 1))) for i in idxs]
        u = 0
        for j in range(64):
            votes = sum((h >> j) & 1 for h in hs)
            if votes * 2 > len(hs):
                u |= 1 << j
        sim[doc_id] = u
    buckets = {}
    for doc_id, u in sim.items():
        for c in range(4):
            buckets.setdefault((c, (u >> (c * 16)) & 0xFFFF), []).append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                ham = bin(sim[a] ^ sim[b]).count("1")
                if ham <= 6:
                    pairs.add((a, b, ham))
    rows = sorted(pairs)
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], pa.int64()),
        "hamming": pa.array([r[2] for r in rows], pa.int64()),
    })


def rolling_hash64(data: bytes) -> int:
    h = 1469598103934665603
    for b in data:
        h = (h * 1000003 + b) & MASK
    return h


def t06_doc_fingerprints(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    per_lang = {}
    for lang, text in zip(docs.column("lang").to_pylist(),
                          docs.column("text").to_pylist()):
        n, fps = per_lang.setdefault(lang, [0, set()])
        per_lang[lang][0] = n + 1
        fps.add(rolling_hash64(text.encode("utf-8")))
    langs = sorted(per_lang)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([per_lang[l][0] for l in langs], pa.int64()),
        "n_distinct_fp": pa.array([len(per_lang[l][1]) for l in langs], pa.int64()),
    })


def t07_bpe_token_stats(sf_dir):
    import regex
    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text", "n_chars"])
    per_lang = {}
    for lang, text, n_chars in zip(docs.column("lang").to_pylist(),
                                   docs.column("text").to_pylist(),
                                   docs.column("n_chars").to_pylist()):
        toks = len(pat.findall(text))
        st = per_lang.setdefault(lang, [0, 0, 0, 0])
        st[0] += 1
        st[1] += toks
        st[2] = max(st[2], toks)
        st[3] += n_chars
    langs = sorted(per_lang)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([per_lang[l][0] for l in langs], pa.int64()),
        "total_bpe_tokens": pa.array([per_lang[l][1] for l in langs], pa.int64()),
        "max_bpe_tokens": pa.array([per_lang[l][2] for l in langs], pa.int64()),
        "total_chars": pa.array([per_lang[l][3] for l in langs], pa.int64()),
    })


def m03_audio_features(sf_dir):
    """Audio features oracle across the binary+codec boundary.

    Rebuilds the deterministic WAV containers the engine synthesizes
    from the documents table (graft.multimodal.Multimodal
    .syntheticMedia: doc_id % 3 == 1 → mono PCM at 8 kHz, 8-bit for even (doc_id/3) and
    16-bit LE signed for odd, nSamples = 2000 + (doc_id % 6000) * 8,
    sample bytes = UTF-8 text cycled), then DECODES them with Python's stdlib `wave` module — an
    independent RIFF parser — and recomputes the integer-exact signal
    features (peak, Σ|s|, Σs², sign-change zero crossings) and the
    per-source aggregate, including the engine's round-half-up
    fixed-point mean.
    """
    import io
    import struct
    import wave

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    per_src = {}
    for doc_id, text, src in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("text").to_pylist(),
                                 docs.column("source").to_pylist()):
        if doc_id % 3 != 1:
            continue
        payload = text.encode("utf-8")
        n = 2000 + (doc_id % 6000) * 8
        wide = (doc_id // 3) % 2 == 1  # 16-bit LE for odd (id/3)
        nbytes = n * 2 if wide else n
        body = (bytes(payload[i % len(payload)] for i in range(nbytes))
                if payload else bytes(nbytes))
        width = 2 if wide else 1
        wav = (b"RIFF" + struct.pack("<I", 36 + nbytes) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                       8000 * width, width, 8 * width)
               + b"data" + struct.pack("<I", nbytes) + body)
        with wave.open(io.BytesIO(wav)) as w:
            assert w.getnchannels() == 1 and w.getsampwidth() == width
            frames = w.readframes(w.getnframes())
        if wide:
            samples = list(struct.unpack(f"<{n}h", frames))
        else:
            samples = [b - 128 for b in frames]
        peak = sum_abs = sum_sq = zc = 0
        prev_neg = False
        for i, s in enumerate(samples):
            a = abs(s)
            sum_abs += a
            sum_sq += a * a
            peak = max(peak, a)
            neg = s < 0
            if i > 0 and neg != prev_neg:
                zc += 1
            prev_neg = neg
        st = per_src.setdefault(src, [0, 0, 0, 0, 0, 0])
        st[0] += 1                      # n_audio (all decode: pcm_real)
        st[1] += len(samples)           # total_samples
        st[2] = max(st[2], peak)        # peak
        st[3] += zc                     # zero_crossings
        st[4] += sum_sq                 # energy
        st[5] += sum_abs                # Σ|s| for mean_abs

    def rhu(s, c, mul):
        # engine Q.rhu: sign(s) * floor((|s|*2*mul + c) / (2*c)) —
        # double math there, exact here while |s|*2*mul < 2^53
        return (s * 2 * mul + c) // (2 * c)

    srcs = sorted(per_src)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_audio": pa.array([per_src[s][0] for s in srcs], pa.int64()),
        "n_pcm_real": pa.array([per_src[s][0] for s in srcs], pa.int64()),
        "total_samples": pa.array([per_src[s][1] for s in srcs], pa.int64()),
        "peak": pa.array([per_src[s][2] for s in srcs], pa.int64()),
        "zero_crossings": pa.array([per_src[s][3] for s in srcs], pa.int64()),
        "energy": pa.array([per_src[s][4] for s in srcs], pa.int64()),
        "mean_abs": pa.array(
            [rhu(per_src[s][5] * 1000, per_src[s][1], 1000) / 1e6 for s in srcs],
            pa.float64()),
    })


def _phash_bits(luma32):
    """Sequency-ordered 2-D WHT pHash (graft.multimodal.ImageOps):
    rows = bitreverse5(gray(s)) for s in 0..7; 63 coefficients
    excluding (0,0); bit set iff coeff > lower median."""
    def seq_row(s):
        g = s ^ (s >> 1)
        return int(format(g, "05b")[::-1], 2)

    rows = [seq_row(s) for s in range(8)]
    sgn = [[1 if bin(h & i).count("1") % 2 == 0 else -1 for i in range(32)]
           for h in range(32)]
    coeffs = []
    for u in range(8):
        hu = rows[u]
        for v in range(8):
            if u == 0 and v == 0:
                continue
            hv = rows[v]
            acc = 0
            for y in range(32):
                sy = sgn[hu][y]
                row = luma32[y * 32:(y + 1) * 32]
                acc += sy * sum(sx * l for sx, l in zip(sgn[hv], row))
            coeffs.append(acc)
    med = sorted(coeffs)[31]
    h = 0
    for k, c in enumerate(coeffs):
        if c > med:
            h |= 1 << k
    return h


def _resize_luma(rgb, w, h):
    """Integer area-average to 32x32 luma (ImageOps.resizeLuma)."""
    out = []
    for i in range(32):
        y0 = i * h // 32
        y1 = max(y0 + 1, (i + 1) * h // 32)
        for j in range(32):
            x0 = j * w // 32
            x1 = max(x0 + 1, (j + 1) * w // 32)
            s = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    p = (y * w + x) * 3
                    s += (77 * rgb[p] + 150 * rgb[p + 1] + 29 * rgb[p + 2]) >> 8
            cnt = (y1 - y0) * (x1 - x0)
            out.append((2 * s + cnt) // (2 * cnt))
    return out


def _png_bmp_phashes(sf_dir):
    """(doc_id, source, fmt, phash) for every png/bmp synthetic image:
    reconstructs the PIXELS the engine's PNG/BMP decoders must produce
    from the deterministic construction rule (Multimodal.syntheticMedia
    / MediaCodec.buildPng+buildBmp: PNG = payload cycled row-major RGB;
    BMP = payload cycled over padded bottom-up BGR rows), then
    recomputes resize+WHT-hash. The engine side went through real
    inflate/unfilter (PNG) and row-flip (BMP) decode — a pixel off
    anywhere changes the hash. Shared by m04 and m09."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    out = []
    for doc_id, text, src in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("text").to_pylist(),
                                 docs.column("source").to_pylist()):
        if doc_id % 3 != 0 or (doc_id // 3) % 4 not in (0, 1):
            continue
        payload = text.encode("utf-8")
        w, h = 16 + doc_id % 32, 12 + doc_id % 24
        if (doc_id // 3) % 4 == 0:  # PNG: payload cycled, row-major RGB
            fmt = "png"
            n = h * w * 3
            rgb = bytes(payload[i % len(payload)] for i in range(n))
        else:  # BMP: payload cycled over padded bottom-up BGR rows
            fmt = "bmp"
            row_bytes = (w * 3 + 3) & ~3
            data = bytes(payload[i % len(payload)] for i in range(row_bytes * h))
            px = bytearray(h * w * 3)
            for y in range(h):
                src_row = (h - 1 - y) * row_bytes
                for x in range(w):
                    b, g, r = data[src_row + 3 * x: src_row + 3 * x + 3]
                    px[(y * w + x) * 3: (y * w + x) * 3 + 3] = bytes((r, g, b))
            rgb = bytes(px)
        out.append((doc_id, src, fmt, _phash_bits(_resize_luma(rgb, w, h))))
    return out


def m04_image_phash(sf_dir):
    """Image pHash profile oracle (see _png_bmp_phashes)."""
    per_key = {}
    for _, src, fmt, ph in _png_bmp_phashes(sf_dir):
        st = per_key.setdefault((src, fmt), [0, set(), 0])
        st[0] += 1
        st[1].add(ph)
        st[2] += bin(ph).count("1")
    keys = sorted(per_key)
    return pa.table({
        "source": pa.array([k[0] for k in keys], pa.string()),
        "format": pa.array([k[1] for k in keys], pa.string()),
        "n_images": pa.array([per_key[k][0] for k in keys], pa.int64()),
        "n_distinct_phash": pa.array([len(per_key[k][1]) for k in keys], pa.int64()),
        "set_bits": pa.array([per_key[k][2] for k in keys], pa.int64()),
    })


def m09_image_neardup(sf_dir):
    """Image near-dup oracle: the engine's exact banding rule
    (4 x 16-bit pHash bands -> candidate on any shared (band, value),
    near-dup iff hamming <= 10) recomputed in pure Python over the
    independently reconstructed hashes (_png_bmp_phashes)."""
    hashes = [(doc_id, ph) for doc_id, _, _, ph in _png_bmp_phashes(sf_dir)]
    buckets = {}
    for doc_id, ph in hashes:
        for b in range(4):
            buckets.setdefault((b, (ph >> (16 * b)) & 0xFFFF), []).append(doc_id)
    phash = dict(hashes)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    nd = [(a, b) for a, b in cand
          if bin(phash[a] ^ phash[b]).count("1") <= 10]
    dup_ids = {x for p in nd for x in p}
    rows = sorted([("n_images", len(hashes)),
                   ("n_candidate_pairs", len(cand)),
                   ("n_neardup_pairs", len(nd)),
                   ("n_dup_images", len(dup_ids))])
    return pa.table({
        "metric": pa.array([r[0] for r in rows], pa.string()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
    })


def _scaled_long(y):
    """graft.functions.ScaledLong.round: |y| >= 1 → half-up via
    floor/ceil; |y| < 1 → HALF_UP on the shortest decimal repr."""
    import math
    from decimal import Decimal, ROUND_HALF_UP
    if math.isfinite(y) and (y >= 1.0 or y <= -1.0):
        return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))
    return int(Decimal(repr(y)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _round6(x):
    """Spark round(x, 6) → DECIMAL(18,6) → DOUBLE."""
    from decimal import Decimal, ROUND_HALF_UP
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def s05_pq_adc_topk(sf_dir):
    """Pure-Python recomputation of the PQ-ADC scan (graft.queries
    .Similarity.pqTopK): identical subspace k-means (first-k init,
    3 rounds, argmin L2² with d² = v·v − 2 v·c + c·c in left-to-right
    folds, ties → smallest cid, scaled-long integer sums / count,
    empty clusters keep their centroid), identical ADC lookup-table
    fold, identical candidate and rescore ordering. Every float op is
    IEEE double in the same order, so the hashes must match exactly."""
    SUBS, SUBDIM, K, ITERS, RESCORE = 8, 8, 16, 3, 50

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "label", "embedding"])
    rows = sorted(zip(tbl.column("vec_id").to_pylist(),
                      tbl.column("label").to_pylist(),
                      tbl.column("embedding").to_pylist()))
    vecs = {vid: [float(x) for x in emb] for vid, _, emb in rows}
    labels = {vid: lab for vid, lab, _ in rows}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cents = [[vecs[vid][s * SUBDIM:(s + 1) * SUBDIM]
              for vid, _, _ in rows[:K]] for s in range(SUBS)]

    def assign(v):
        codes = []
        for s in range(SUBS):
            sv = v[s * SUBDIM:(s + 1) * SUBDIM]
            dss = dot(sv, sv)
            best, bd = -1, None
            for cid, c in enumerate(cents[s]):
                d2 = (dss - 2.0 * dot(sv, c)) + dot(c, c)
                if bd is None or d2 < bd:
                    best, bd = cid, d2
            codes.append(best)
        return codes

    for _ in range(ITERS):
        sums = {}
        for vid, _, _ in rows:
            v = vecs[vid]
            for s, cid in enumerate(assign(v)):
                st = sums.setdefault((s, cid), [[0] * SUBDIM, 0])
                for i in range(SUBDIM):
                    st[0][i] += _scaled_long(v[s * SUBDIM + i] * 1e9)
                st[1] += 1
        nxt = [[list(c) for c in cs] for cs in cents]
        for (s, cid), (sl, nc) in sums.items():
            nxt[s][cid] = [(x / 1e9) / nc for x in sl]
        cents = nxt

    qv = vecs[0]
    lut = [[dot(qv[s * SUBDIM:(s + 1) * SUBDIM], c) for c in cents[s]]
           for s in range(SUBS)]
    cands = []
    for vid, _, _ in rows:
        if vid == 0:
            continue
        codes = assign(vecs[vid])
        approx = 0.0
        for s in range(SUBS):
            approx = approx + lut[s][codes[s]]
        cands.append((vid, approx))
    cands.sort(key=lambda t: (-t[1], t[0]))

    def cos(a, b):
        na = 0.0
        nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        import math
        return dot(a, b) / (math.sqrt(na) * math.sqrt(nb))

    out = []
    for vid, approx in cands[:RESCORE]:
        out.append((vid, labels[vid], _round6(approx), _round6(cos(vecs[vid], qv))))
    out.sort(key=lambda t: (-t[3], t[0]))
    out = out[:10]
    return pa.table({
        "vec_id": pa.array([r[0] for r in out], pa.int64()),
        "label": pa.array([r[1] for r in out], pa.int64()),
        "adc_ip": pa.array([r[2] for r in out], pa.float64()),
        "cos_sim": pa.array([r[3] for r in out], pa.float64()),
    })


def _jround(x):
    """Java Math.round(double): floor(x + 0.5) — NOT Python's
    banker's rounding."""
    import math
    return int(math.floor(x + 0.5))


def _clamp255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def m05_pixel_stats(sf_dir):
    """Pixel-statistic oracle across ALL FOUR image decoders.

    Reconstructs the decoded RGB the engine must produce for every
    synthetic image (Multimodal.syntheticMedia):
      - PNG ((doc_id/3)%3 = 0): payload cycled row-major RGB — the
        engine went through real deflate/inflate + unfilter;
      - BMP (= 1): payload cycled over 4-byte-padded bottom-up BGR
        rows — the engine parsed and flipped the real container;
      - JPEG (= 2): block-constant colors through the encoder's
        RGB→YCbCr (Java floor(x+0.5) rounding) and the decoder's
        YCbCr→RGB doubles, mirrored operation-for-operation. The
        DCT/quant round-trip is exact by construction (DC-only blocks,
        all-ones quant table), so color conversion is the only pixel
        math — identical IEEE operations in identical order.
    Then recomputes the integer R/G/B/luma sums per (source, format).
    """
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    agg = {}
    for doc_id, text, src in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("text").to_pylist(),
                                 docs.column("source").to_pylist()):
        if doc_id % 3 != 0:
            continue
        payload = text.encode("utf-8")
        w, h = 16 + doc_id % 32, 12 + doc_id % 24
        sub = (doc_id // 3) % 4
        if sub == 0:  # PNG: payload cycled, row-major RGB
            fmt = "png"
            n = h * w * 3
            rgb = bytes(payload[i % len(payload)] for i in range(n))
        elif sub == 1:  # BMP: payload cycled over padded bottom-up BGR
            fmt = "bmp"
            row_bytes = (w * 3 + 3) & ~3
            data = bytes(payload[i % len(payload)] for i in range(row_bytes * h))
            px = bytearray(h * w * 3)
            for y in range(h):
                src_row = (h - 1 - y) * row_bytes
                for x in range(w):
                    b, g, r = data[src_row + 3 * x: src_row + 3 * x + 3]
                    px[(y * w + x) * 3: (y * w + x) * 3 + 3] = bytes((r, g, b))
            rgb = bytes(px)
        elif sub == 3:  # GIF: grayscale palette over payload-cycled indices
            fmt = "gif"
            rgb = bytes(payload[k % len(payload)] for k in range(h * w)
                        for _ in range(3))
        else:  # JPEG: block-constant colors through YCbCr and back
            fmt = "jpeg"
            px = bytearray(h * w * 3)
            cache = {}
            for by in range((h + 7) // 8):
                for bx in range((w + 7) // 8):
                    r0 = (doc_id * 7 + bx * 31 + by * 17) % 256
                    g0 = (doc_id * 3 + bx * 13 + by * 7) % 256
                    b0 = (doc_id * 11 + bx * 5 + by * 29) % 256
                    # encoder forward convert (MediaCodec.buildJpeg)
                    yy = _clamp255(_jround(0.299 * r0 + 0.587 * g0 + 0.114 * b0))
                    cb = _clamp255(_jround(128.0 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0))
                    cr = _clamp255(_jround(128.0 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0))
                    # decoder inverse convert (decodeJpegPixels)
                    r2 = _clamp255(_jround(yy + 1.402 * (cr - 128.0)))
                    g2 = _clamp255(_jround(yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)))
                    b2 = _clamp255(_jround(yy + 1.772 * (cb - 128.0)))
                    cache[(bx, by)] = (r2, g2, b2)
            for y in range(h):
                for x in range(w):
                    r2, g2, b2 = cache[(x // 8, y // 8)]
                    px[(y * w + x) * 3: (y * w + x) * 3 + 3] = bytes((r2, g2, b2))
            rgb = bytes(px)
        st = agg.setdefault((src, fmt), [0, 0, 0, 0, 0, 0])
        st[0] += 1
        st[1] += len(rgb) // 3
        for p in range(0, len(rgb), 3):
            r, g, b = rgb[p], rgb[p + 1], rgb[p + 2]
            st[2] += r
            st[3] += g
            st[4] += b
            st[5] += (77 * r + 150 * g + 29 * b) >> 8
    keys = sorted(agg)
    return pa.table({
        "source": pa.array([k[0] for k in keys], pa.string()),
        "format": pa.array([k[1] for k in keys], pa.string()),
        "n_images": pa.array([agg[k][0] for k in keys], pa.int64()),
        "n_pixels": pa.array([agg[k][1] for k in keys], pa.int64()),
        "sum_r": pa.array([agg[k][2] for k in keys], pa.int64()),
        "sum_g": pa.array([agg[k][3] for k in keys], pa.int64()),
        "sum_b": pa.array([agg[k][4] for k in keys], pa.int64()),
        "sum_luma": pa.array([agg[k][5] for k in keys], pa.int64()),
    })


def m07_frame_pixels(sf_dir):
    """MJPEG frame-pixel oracle: reconstructs every frame of every
    synthetic MJPEG video (Multimodal.syntheticMjpegVideos — docs with
    doc_id % 3 == 2) through the SAME color math as m05's JPEG branch
    (block-constant DC-only blocks: encoder RGB→YCbCr with Java
    floor(x+0.5) rounding, decoder YCbCr→RGB doubles), with frame_idx
    mixed into the block colors, plus the stts timing formula
    (constant per-frame duration at timescale 1000 → ts = fi*dur).
    Recomputes the integer pixel sums per (source, frame_idx)."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    agg = {}
    for doc_id, src in zip(docs.column("doc_id").to_pylist(),
                           docs.column("source").to_pylist()):
        if doc_id % 3 != 2:
            continue
        w, h = 16 + doc_id % 16, 16 + doc_id % 8
        n_frames = 3 + doc_id % 4
        frame_dur = 100 + (doc_id % 10) * 20
        for fi in range(n_frames):
            ts_ms = fi * frame_dur
            # block-constant color through encode+decode converts
            sr = sg = sb = sl = 0
            for by in range((h + 7) // 8):
                for bx in range((w + 7) // 8):
                    r0 = (doc_id * 7 + fi * 19 + bx * 31 + by * 17) % 256
                    g0 = (doc_id * 3 + fi * 23 + bx * 13 + by * 7) % 256
                    b0 = (doc_id * 11 + fi * 29 + bx * 5 + by * 29) % 256
                    yy = _clamp255(_jround(0.299 * r0 + 0.587 * g0 + 0.114 * b0))
                    cb = _clamp255(_jround(128.0 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0))
                    cr = _clamp255(_jround(128.0 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0))
                    r2 = _clamp255(_jround(yy + 1.402 * (cr - 128.0)))
                    g2 = _clamp255(_jround(yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)))
                    b2 = _clamp255(_jround(yy + 1.772 * (cb - 128.0)))
                    # pixels of this block inside the image bounds
                    npx = (min(8, w - bx * 8)) * (min(8, h - by * 8))
                    sr += r2 * npx
                    sg += g2 * npx
                    sb += b2 * npx
                    sl += ((77 * r2 + 150 * g2 + 29 * b2) >> 8) * npx
            st = agg.setdefault((src, fi), [0, 0, 0, 0, 0, 0, 0, 0])
            st[0] += 1          # n_frames
            st[1] += 1          # n_real (every frame decodes)
            st[2] += ts_ms
            st[3] += w * h
            st[4] += sr
            st[5] += sg
            st[6] += sb
            st[7] += sl
    keys = sorted(agg)
    return pa.table({
        "source": pa.array([k[0] for k in keys], pa.string()),
        "frame_idx": pa.array([k[1] for k in keys], pa.int64()),
        "n_frames": pa.array([agg[k][0] for k in keys], pa.int64()),
        "n_real": pa.array([agg[k][1] for k in keys], pa.int64()),
        "sum_ts_ms": pa.array([agg[k][2] for k in keys], pa.int64()),
        "n_pixels": pa.array([agg[k][3] for k in keys], pa.int64()),
        "sum_r": pa.array([agg[k][4] for k in keys], pa.int64()),
        "sum_g": pa.array([agg[k][5] for k in keys], pa.int64()),
        "sum_b": pa.array([agg[k][6] for k in keys], pa.int64()),
        "sum_luma": pa.array([agg[k][7] for k in keys], pa.int64()),
    })


# ---- m01: byte-exact container reconstruction ------------------------
# Mirrors every MediaCodec builder byte-for-byte (the builders are
# deterministic by design: PNG IDAT uses hand-framed stored deflate
# blocks, the JPEG entropy streams are hand-rolled, BMP/WAV/MP4 are
# fixed layouts), then the sniff -> decode -> feature path of
# Multimodal.decodeRecord, so m01's per-(kind, format) integer
# aggregates are recomputed from documents.parquet alone.

def _le16(v):
    return bytes((v & 0xFF, (v >> 8) & 0xFF))


def _le32(v):
    return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF))


def _be16b(v):
    return bytes(((v >> 8) & 0xFF, v & 0xFF))


def _be32b(v):
    return bytes(((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF))


def _cyc(payload, n):
    if not payload or n == 0:
        return bytes(n)
    return (payload * (n // len(payload) + 1))[:n]


def _build_png(w, h, payload):
    import zlib
    stride = w * 3
    pix = _cyc(payload, h * stride)
    raw = bytearray()
    for y in range(h):
        f = y % 5
        raw.append(f)
        for x in range(stride):
            v = pix[y * stride + x]
            a = pix[y * stride + x - 3] if x >= 3 else 0
            up = pix[(y - 1) * stride + x] if y > 0 else 0
            c = pix[(y - 1) * stride + x - 3] if x >= 3 and y > 0 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (a + up) // 2
            else:
                p = a + up - c
                pa_, pb_, pc_ = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (up if pb_ <= pc_ else c)
            raw.append((v - pred) & 0xFF)
    comp = bytearray(b"\x78\x01")
    off = 0
    while True:
        n = min(65535, len(raw) - off)
        comp.append(1 if off + n >= len(raw) else 0)
        comp += bytes((n & 0xFF, (n >> 8) & 0xFF, (~n) & 0xFF, ((~n) >> 8) & 0xFF))
        comp += raw[off:off + n]
        off += n
        if off >= len(raw):
            break
    comp += _be32b(zlib.adler32(bytes(raw)) & 0xFFFFFFFF)

    def chunk(typ, body):
        return (_be32b(len(body)) + typ + body
                + _be32b(zlib.crc32(typ + body) & 0xFFFFFFFF))
    ihdr = _be32b(w) + _be32b(h) + bytes((8, 2, 0, 0, 0))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", bytes(comp)) + chunk(b"IEND", b""))


def _build_bmp(w, h, payload):
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    return (b"BM" + _le32(54 + data_size) + _le32(0) + _le32(54)
            + _le32(40) + _le32(w) + _le32(h) + _le16(1) + _le16(24)
            + _le32(0) + _le32(data_size) + _le32(2835) + _le32(2835)
            + _le32(0) + _le32(0) + _cyc(payload, data_size))


def _build_gif(w, h, payload):
    """Byte mirror of MediaCodec.buildGif: GIF89a, 256-entry grayscale
    palette, uncompressed-LZW body (9-bit literal codes, clear every
    254 symbols)."""
    out = bytearray(b"GIF89a")
    out += _le16(w) + _le16(h)
    out += bytes((0xF7, 0, 0))
    for ci in range(256):
        out += bytes((ci, ci, ci))
    out += bytes((0x2C,)) + _le16(0) + _le16(0) + _le16(w) + _le16(h) + bytes((0,))
    out.append(8)  # LZW minimum code size
    body = bytearray()
    acc = 0
    nacc = 0

    def put(c):
        nonlocal acc, nacc
        acc |= c << nacc
        nacc += 9
        while nacc >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    put(256)
    n_pix = w * h
    for k in range(n_pix):
        if k > 0 and k % 254 == 0:
            put(256)
        put(payload[k % len(payload)] if payload else 0)
    put(257)
    if nacc > 0:
        body.append(acc & 0xFF)
    off = 0
    while off < len(body):
        n = min(255, len(body) - off)
        out.append(n)
        out += body[off:off + n]
        off += n
    out += bytes((0, 0x3B))
    return bytes(out)


class _JBits:
    """JPEG entropy bit writer with 0xFF stuffing, 1-padding flush."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def _emit(self):
        self.out.append(self.cur)
        if self.cur == 0xFF:
            self.out.append(0)
        self.cur = 0
        self.n = 0

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self._emit()

    def flush(self):
        while self.n:
            self.cur = (self.cur << 1) | 1
            self.n += 1
            if self.n == 8:
                self._emit()

    def take(self):
        b = bytes(self.out)
        self.out = bytearray()
        return b


def _jseg(marker, body):
    return bytes((0xFF, marker)) + _be16b(len(body) + 2) + body


def _jpeg_dcs(r, g, b):
    y = _clamp255(_jround(0.299 * r + 0.587 * g + 0.114 * b))
    cb = _clamp255(_jround(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b))
    cr = _clamp255(_jround(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b))
    return (8 * (y - 128), 8 * (cb - 128), 8 * (cr - 128))


_JPEG_DHT_DC = bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))


def _build_jpeg(w, h, colors):
    out = bytearray(b"\xFF\xD8")
    out += _jseg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _jseg(0xC0, bytes([8]) + _be16b(h) + _be16b(w)
                 + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += _jseg(0xC4, _JPEG_DHT_DC)
    out += _jseg(0xC4, bytes([0x10]) + bytes([0, 1] + [0] * 14) + bytes([0x00]))
    out += _jseg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bw = _JBits()
    pred = [0, 0, 0]
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            dcs = _jpeg_dcs(*colors(bx, by))
            for ci in range(3):
                diff = dcs[ci] - pred[ci]
                pred[ci] = dcs[ci]
                s = 0 if diff == 0 else abs(diff).bit_length()
                bw.put(s, 4)
                if s:
                    bw.put(diff + (1 << s) - 1 if diff < 0 else diff, s)
                bw.put(0, 2)  # AC EOB
    bw.flush()
    out += bw.take()
    out += b"\xFF\xD9"
    return bytes(out)


def _build_pjpeg(w, h, colors):
    """Progressive (SOF2) five-scan twin of _build_jpeg — mirrors
    MediaCodec.buildProgressiveJpeg."""
    out = bytearray(b"\xFF\xD8")
    out += _jseg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _jseg(0xC2, bytes([8]) + _be16b(h) + _be16b(w)
                 + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += _jseg(0xC4, _JPEG_DHT_DC)
    out += _jseg(0xC4, bytes([0x10]) + bytes([0, 0, 0, 15] + [0] * 12)
                 + bytes((r << 4) for r in range(15)))
    bxs, bys = (w + 7) // 8, (h + 7) // 8
    nb = bxs * bys
    bw = _JBits()
    # scan 1: DC first, interleaved, Ah=0 Al=1
    out += _jseg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    pred = [0, 0, 0]
    for by in range(bys):
        for bx in range(bxs):
            dcs = _jpeg_dcs(*colors(bx, by))
            for ci in range(3):
                pt = dcs[ci] >> 1
                diff = pt - pred[ci]
                pred[ci] = pt
                s = 0 if diff == 0 else abs(diff).bit_length()
                bw.put(s, 4)
                if s:
                    bw.put(diff + (1 << s) - 1 if diff < 0 else diff, s)
    bw.flush()
    out += bw.take()
    # scans 2-4: AC first, full band, per component — pure EOB runs
    for comp in (1, 2, 3):
        out += _jseg(0xDA, bytes([1, comp, 0x00, 1, 63, 0x00]))
        left = nb
        while left > 0:
            chunk = min(left, 1 << 14)
            r = chunk.bit_length() - 1
            bw.put(r, 4)
            if r:
                bw.put(chunk - (1 << r), r)
            left -= chunk
        bw.flush()
        out += bw.take()
    # scan 5: DC refinement Ah=1 Al=0 — bit 0 of every (even) DC: 0
    out += _jseg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    for _ in range(nb * 3):
        bw.put(0, 1)
    bw.flush()
    out += bw.take()
    out += b"\xFF\xD9"
    return bytes(out)


def _build_wav(rate, n, payload):
    return (b"RIFF" + _le32(36 + n) + b"WAVE"
            + b"fmt " + _le32(16) + _le16(1) + _le16(1)
            + _le32(rate) + _le32(rate) + _le16(1) + _le16(8)
            + b"data" + _le32(n) + _cyc(payload, n))


def _build_wav16(rate, n, payload):
    nb = n * 2
    return (b"RIFF" + _le32(36 + nb) + b"WAVE"
            + b"fmt " + _le32(16) + _le16(1) + _le16(1)
            + _le32(rate) + _le32(rate * 2) + _le16(2) + _le16(16)
            + b"data" + _le32(nb) + _cyc(payload, nb))


_MP4_MATRIX = b"".join(_be32b(v) for v in
                       (0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000))


def _build_mp4(dur, w, h, nd, payload):
    mvhd = (_be32b(108) + b"mvhd" + _be32b(0) + _be32b(0) * 2
            + _be32b(1000) + _be32b(dur)
            + _be32b(0x00010000) + _be16b(0x0100) + _be16b(0)
            + _be32b(0) * 2 + _MP4_MATRIX + _be32b(0) * 6 + _be32b(2))
    tkhd = (_be32b(92) + b"tkhd" + _be32b(7) + _be32b(0) * 2
            + _be32b(1) + _be32b(0) + _be32b(dur) + _be32b(0) * 2
            + _be16b(0) * 4 + _MP4_MATRIX
            + _be32b((w << 16) & 0xFFFFFFFF) + _be32b((h << 16) & 0xFFFFFFFF))
    return (_be32b(20) + b"ftyp" + b"isom" + _be32b(0) + b"isom"
            + _be32b(216) + b"moov" + mvhd + _be32b(100) + b"trak" + tkhd
            + _be32b(8 + nd) + b"mdat" + _cyc(payload, nd))


def _content_hash64(data):
    """graft histAndHash: h = h*1000003 + byte over 64 bits, FNV
    offset seed. Returned unsigned (distinct-count equivalent)."""
    h = 1469598103934665603
    for b in data:
        h = (h * 1000003 + b) & MASK
    return h


def m01_media_features(sf_dir):
    agg = {}
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    for doc_id, text in zip(docs.column("doc_id").to_pylist(),
                            docs.column("text").to_pylist()):
        payload = text.encode("utf-8")
        preal = False
        if doc_id % 3 == 0:
            kind = "image"
            w, h = 16 + doc_id % 32, 12 + doc_id % 24
            sub = (doc_id // 3) % 4
            if sub == 0:
                fmt, content = "png", _build_png(w, h, payload)
            elif sub == 1:
                fmt, content = "bmp", _build_bmp(w, h, payload)
            elif sub == 3:
                fmt, content = "gif", _build_gif(w, h, payload)
            else:
                def colors(bx, by, i=doc_id):
                    return ((i * 7 + bx * 31 + by * 17) % 256,
                            (i * 3 + bx * 13 + by * 7) % 256,
                            (i * 11 + bx * 5 + by * 29) % 256)
                fmt = "jpeg"
                content = (_build_jpeg(w, h, colors) if (doc_id // 9) % 2 == 0
                           else _build_pjpeg(w, h, colors))
            width, height, dur = w, h, 0
            preal = True
        elif doc_id % 3 == 1:
            kind, fmt = "audio", "wav"
            n = 2000 + (doc_id % 6000) * 8
            content = (_build_wav16(8000, n, payload) if (doc_id // 3) % 2 == 1
                       else _build_wav(8000, n, payload))
            width, height, dur = 0, 0, (n * 1000) // 8000
        else:
            kind = "video"
            if (doc_id // 3) % 2 == 0:
                fmt = "mp4"
                dur = 3000 + doc_id % 9000
                width = 160 + (doc_id % 8) * 16
                height = 96 + (doc_id % 6) * 16
                content = _build_mp4(dur, width, height,
                                     500 + (doc_id % 1500), payload)
            else:  # raw bytes -> FakeCodec pseudo path
                fmt = "unknown"
                content = payload
                hu = _content_hash64(content)
                ha = abs(hu - (1 << 64) if hu >= (1 << 63) else hu)
                width = 64 + ha % 1024
                height = (width * 3) // 4
                dur = 1000 + ha % 59000
        st = agg.setdefault((kind, fmt), [0, 0, 0, 0, 0, 0, 0, 0, set()])
        st[0] += 1
        st[1] += 1 if fmt != "unknown" else 0
        st[2] += 1 if preal else 0
        st[3] += len(content)
        st[4] += width
        st[5] += height
        st[6] += dur
        st[7] += sum(1 for b in content if b >> 4 == 0)
        st[8].add(_content_hash64(content))
    keys = sorted(agg)
    return pa.table({
        "kind": pa.array([k[0] for k in keys], pa.string()),
        "format": pa.array([k[1] for k in keys], pa.string()),
        "n_media": pa.array([agg[k][0] for k in keys], pa.int64()),
        "n_sniffed": pa.array([agg[k][1] for k in keys], pa.int64()),
        "n_pixels_real": pa.array([agg[k][2] for k in keys], pa.int64()),
        "total_bytes": pa.array([agg[k][3] for k in keys], pa.int64()),
        "sum_width": pa.array([agg[k][4] for k in keys], pa.int64()),
        "sum_height": pa.array([agg[k][5] for k in keys], pa.int64()),
        "sum_duration_ms": pa.array([agg[k][6] for k in keys], pa.int64()),
        "bin0_bytes": pa.array([agg[k][7] for k in keys], pa.int64()),
        "n_distinct": pa.array([len(agg[k][8]) for k in keys], pa.int64()),
    })


M32 = 0xFFFFFFFF


def _rotl32(x, r):
    x &= M32
    return ((x << r) | (x >> (32 - r))) & M32


def _murmur3_32(data: bytes, seed: int) -> int:
    """Spark Murmur3_x86_32.hashUnsafeBytes: 4-byte LE words, then the
    TAIL bytes one at a time, each sign-extended and fully mixed (NOT
    the standard murmur3 tail). Returns SIGNED 32-bit."""
    c1, c2 = 0xCC9E2D51, 0x1B873593

    def mix_k1(k1):
        k1 = (k1 * c1) & M32
        k1 = _rotl32(k1, 15)
        return (k1 * c2) & M32

    def mix_h1(h1, k1):
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        return (h1 * 5 + 0xE6546B64) & M32

    h1 = seed & M32
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i:i + 4], "little")
        h1 = mix_h1(h1, mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        half = b - 256 if b >= 128 else b  # sign-extended java byte
        h1 = mix_h1(h1, mix_k1(half & M32))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _xxh64_fmix(h):
    h &= MASK
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def _xxh64_int(i, seed):
    # Spark XXH64.hashInt: the 4-byte single-chunk path
    h = (seed + P5 + 4) & MASK
    h ^= ((i & M32) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _xxh64_fmix(h)


def _xxh64_long(v, seed):
    # Spark XXH64.hashLong: the 8-byte single-chunk path
    h = (seed + P5 + 8) & MASK
    h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _xxh64_fmix(h)


def _splitmix(seed):
    z = (seed + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


_MH_A = [_splitmix(2 * i) | 1 for i in range(64)]
_MH_B = [_splitmix(2 * i + 1) for i in range(64)]


def d03_lsh_candidates(sf_dir):
    """MinHash-LSH candidate pairs: faithful recompute of the engine's
    MinHash64 expression (murmur3-derived base hash + 64 affine
    permutations over Z/2^64, unsigned min) and the 16x4 band hash
    (Spark xxhash64 seed chaining: int arg then four longs)."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    buckets = {}
    for doc_id, text in zip(docs.column("doc_id").to_pylist(),
                            docs.column("text").to_pylist()):
        ws = text.split(" ")
        if len(ws) < 3:
            continue
        shingles = []
        seen = set()
        for i in range(len(ws) - 2):
            sh = " ".join(ws[i:i + 3])
            if sh not in seen:
                seen.add(sh)
                shingles.append(sh)
        # engine compares UNSIGNED with mins initialized to SIGNED
        # Long.MaxValue (0x7FFF...), which unsigned is mid-range: a
        # permuted hash above 2^63 never beats an "empty" slot.
        # Replicate exactly.
        mins = [0x7FFFFFFFFFFFFFFF] * 64
        for sh in shingles:
            data = sh.encode("utf-8")
            m1 = _murmur3_32(data, 42)
            m2 = _murmur3_32(data, 1337)
            h = ((m1 * 0x9E3779B97F4A7C15) ^ (m2 & MASK)) & MASK
            for p in range(64):
                v = (_MH_A[p] * h + _MH_B[p]) & MASK
                if v < mins[p]:
                    mins[p] = v
        for b in range(16):
            hb = _xxh64_int(b, 42)
            for j in range(4):
                hb = _xxh64_long(mins[4 * b + j], hb)
            buckets.setdefault((b, hb), []).append(doc_id)
    pairs = {}
    for ids in buckets.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs[(ids[x], ids[y])] = pairs.get((ids[x], ids[y]), 0) + 1
    rows = sorted((a, b, c) for (a, b), c in pairs.items())
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], pa.int64()),
        "shared_bands": pa.array([r[2] for r in rows], pa.int64()),
    })


def g03_connected_components(sf_dir):
    # Repeat-trade graph: edge (2*custkey, 2*suppkey+1) when the pair
    # shares >= 2 distinct orders. Components via a REAL union-find —
    # an iterative fixed-point needs no unrolled-SQL trick here; the
    # independence from the engine's pointer-jumping implementation is
    # the point.
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"])
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey"])
    cust_of = dict(zip(orders.column("o_orderkey").to_pylist(),
                       orders.column("o_custkey").to_pylist()))
    pair_orders = {}
    for ok, sk in zip(li.column("l_orderkey").to_pylist(),
                      li.column("l_suppkey").to_pylist()):
        c = cust_of.get(ok)
        if c is not None:
            pair_orders.setdefault((c, sk), set()).add(ok)
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    for (c, sk), oks in pair_orders.items():
        if len(oks) >= 2:
            union(2 * c, 2 * sk + 1)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    rows = sorted(
        (min(ms), len(ms),
         sum(1 for m in ms if m % 2 == 0),
         sum(1 for m in ms if m % 2 == 1))
        for ms in comps.values())
    return pa.table({
        "comp_rep": pa.array([r[0] for r in rows], pa.int64()),
        "n_nodes": pa.array([r[1] for r in rows], pa.int64()),
        "n_customers": pa.array([r[2] for r in rows], pa.int64()),
        "n_suppliers": pa.array([r[3] for r in rows], pa.int64()),
    })


def a03_approx_sketches(sf_dir, got):
    """Error-bound validator for the sketch query (HLL++ count-distinct
    + GK percentile_approx): sketch OUTPUTS are engine-specific, but
    their documented error contracts are checkable against an
    independent exact recompute of the events table. Checks, per
    event_type row of the SPARK output:
      - exact_users equals the exact recomputed distinct count
        (hard equality — this column is not a sketch);
      - approx_users within 3x the requested relative standard
        deviation (rsd=0.05 -> |a-e|/e <= 0.15) of the exact count;
      - p50/p99 are ACTUAL data values whose rank window overlaps the
        requested quantile's rank +/- eps*n (GK accuracy=100 ->
        eps=0.01), +/-1 rank slack for interpolation conventions.
    Returns (ok: bool, msg: str) — a bounds validator, not a
    value-equality oracle (see PY_VALIDATORS)."""
    tab = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_type", "user_id", "value"])
    by = {}
    for et, uid, val in zip(tab["event_type"].to_pylist(),
                            tab["user_id"].to_pylist(),
                            tab["value"].to_pylist()):
        u, v = by.setdefault(et, (set(), []))
        u.add(uid)
        if val is not None:
            v.append(val)
    rows = {r["event_type"]: r for r in got.to_pylist()}
    if set(rows) != set(by):
        return False, f"event_type sets differ: {sorted(rows)} vs {sorted(by)}"
    eps = 1.0 / 100  # GK rank error at accuracy=100
    msgs = []
    for et, (users, vals) in sorted(by.items()):
        r = rows[et]
        exact = len(users)
        if r["exact_users"] != exact:
            return False, f"{et}: exact_users {r['exact_users']} != {exact}"
        rel = abs(r["approx_users"] - exact) / max(exact, 1)
        if rel > 0.15:
            return False, (f"{et}: approx_users {r['approx_users']} vs "
                           f"exact {exact} (rel err {rel:.3f} > 0.15)")
        vs = sorted(vals)
        n = len(vs)
        for q, cname in ((0.5, "p50_value"), (0.99, "p99_value")):
            p = r[cname]
            # rank window of the returned value in the exact sorted data
            import bisect
            first = bisect.bisect_left(vs, p)
            last = bisect.bisect_right(vs, p) - 1
            if first > last:
                return False, f"{et}: {cname}={p} is not a data value"
            lo = (q - eps) * (n - 1) - 1
            hi = (q + eps) * (n - 1) + 1
            if last < lo or first > hi:
                return False, (f"{et}: {cname}={p} rank [{first},{last}] "
                               f"outside [{lo:.1f},{hi:.1f}] of n={n}")
        msgs.append(f"{et}: approx rel err {rel:.3f}")
    return True, "; ".join(msgs)


# Bounds validators: name -> fn(sf_dir, spark_output_arrow_table) ->
# (ok, msg). Unlike PY_ORACLES (exact value-equality recomputes),
# these check a documented error contract — the right shape for
# sketches whose exact output is engine-specific by construction.
PY_VALIDATORS = {
    "a03_approx_sketches": a03_approx_sketches,
}



def m08_audio_decimate(sf_dir):
    """Audio stride-decimation oracle (m08): same independent WAV
    reconstruction + stdlib `wave` decode as m03, then the stated
    contract — every 4th sample of the mono stream — and the m03
    integer-exact aggregate family over the decimated stream."""
    import io
    import struct
    import wave

    stride = 4
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    per_src = {}
    for doc_id, text, src in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("text").to_pylist(),
                                 docs.column("source").to_pylist()):
        if doc_id % 3 != 1:
            continue
        payload = text.encode("utf-8")
        n = 2000 + (doc_id % 6000) * 8
        wide = (doc_id // 3) % 2 == 1
        nbytes = n * 2 if wide else n
        body = (bytes(payload[i % len(payload)] for i in range(nbytes))
                if payload else bytes(nbytes))
        width = 2 if wide else 1
        wav = (b"RIFF" + struct.pack("<I", 36 + nbytes) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                       8000 * width, width, 8 * width)
               + b"data" + struct.pack("<I", nbytes) + body)
        with wave.open(io.BytesIO(wav)) as w:
            frames = w.readframes(w.getnframes())
        if wide:
            samples = list(struct.unpack(f"<{n}h", frames))
        else:
            samples = [b - 128 for b in frames]
        dec = samples[::stride]
        peak = max((abs(s) for s in dec), default=0)
        sum_abs = sum(abs(s) for s in dec)
        sum_sq = sum(abs(s) * abs(s) for s in dec)
        st = per_src.setdefault(src, [0, 0, 0, 0, 0])
        st[0] += 1
        st[1] += len(dec)
        st[2] = max(st[2], peak)
        st[3] += sum_sq
        st[4] += sum_abs

    def rhu(s, c, mul):
        return (s * 2 * mul + c) // (2 * c)

    srcs = sorted(per_src)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_audio": pa.array([per_src[s][0] for s in srcs], pa.int64()),
        "total_out_samples": pa.array([per_src[s][1] for s in srcs], pa.int64()),
        "peak": pa.array([per_src[s][2] for s in srcs], pa.int64()),
        "energy": pa.array([per_src[s][3] for s in srcs], pa.int64()),
        "mean_abs": pa.array(
            [rhu(per_src[s][4] * 1000, per_src[s][1], 1000) / 1e6 for s in srcs],
            pa.float64()),
    })


def d14_longest_dup_substrings(sf_dir):
    """Independent recompute of the generalized-suffix-array repeat
    report: materialize and sort ALL document suffixes (the O(n^2)
    relation the engine never materializes), adjacent-pair LCP capped
    at 2048 chars, keep >= 32, top-20 by (lcp desc, doc_a, off_a,
    doc_b, off_b). Total order matches the engine: (suffix string,
    doc_id, off)."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = list(zip(docs.column("doc_id").to_pylist(),
                    docs.column("text").to_pylist()))
    sufs = sorted(((text[o:], did, o)
                   for did, text in rows for o in range(len(text))),
                  key=lambda t: (t[0], t[1], t[2]))
    out = []
    for i in range(len(sufs) - 1):
        s1, d1, o1 = sufs[i]
        s2, d2, o2 = sufs[i + 1]
        m = min(len(s1), len(s2), 2048)
        l = 0
        while l < m and s1[l] == s2[l]:
            l += 1
        if l >= 32:
            out.append((l, d1, o1, d2, o2))
    out.sort(key=lambda r: (-r[0], r[1], r[2], r[3], r[4]))
    top = out[:20]
    return pa.table({
        "lcp": pa.array([r[0] for r in top], pa.int64()),
        "doc_a": pa.array([r[1] for r in top], pa.int64()),
        "off_a": pa.array([r[2] for r in top], pa.int64()),
        "doc_b": pa.array([r[3] for r in top], pa.int64()),
        "off_b": pa.array([r[4] for r in top], pa.int64()),
    })


def _d15_rows(sf_dir):
    """The d15 recompute body, shared with c16's funnel oracle:
    returns (doc_id, source, n_chars, n_removed, text_clean) rows in
    doc_id order — sort ALL suffixes (total order = (suffix string,
    doc_id, off), the d14 order); every suffix whose LCP with its SA
    PREDECESSOR is >= 32 (capped at 2048) loses that shared prefix
    [off, off+lcp); spans union-merge per doc; cleaned text is the
    complement. Keeper = SA-first occurrence, exactly the engine
    contract."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    rows = list(zip(docs.column("doc_id").to_pylist(),
                    docs.column("source").to_pylist(),
                    docs.column("text").to_pylist()))
    sufs = sorted(((text[o:], did, o)
                   for did, _, text in rows for o in range(len(text))),
                  key=lambda t: (t[0], t[1], t[2]))
    spans = {}
    for i in range(1, len(sufs)):
        s1, _, _ = sufs[i - 1]
        s2, d2, o2 = sufs[i]
        m = min(len(s1), len(s2), 2048)
        l = 0
        while l < m and s1[l] == s2[l]:
            l += 1
        if l >= 32:
            spans.setdefault(d2, []).append((o2, o2 + l))
    out = []
    for did, src, text in sorted(rows):
        merged = []
        for st, en in sorted(spans.get(did, [])):
            if merged and st <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], en)
            else:
                merged.append([st, en])
        removed = sum(en - st for st, en in merged)
        pieces, pos = [], 0
        for st, en in merged:
            pieces.append(text[pos:st])
            pos = en
        pieces.append(text[pos:])
        out.append((did, src, len(text), removed, "".join(pieces)))
    return out


def d15_substring_removal(sf_dir):
    """Independent recompute of the suffix-array exact-substring
    removal (see _d15_rows)."""
    rows = _d15_rows(sf_dir)
    out_id = [r[0] for r in rows]
    out_src = [r[1] for r in rows]
    out_nc = [r[2] for r in rows]
    out_nr = [r[3] for r in rows]
    out_tc = [r[4] for r in rows]
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "source": pa.array(out_src, pa.string()),
        "n_chars": pa.array(out_nc, pa.int64()),
        "n_removed": pa.array(out_nr, pa.int64()),
        "text_clean": pa.array(out_tc, pa.string()),
    })


def d16_exact_decontamination(sf_dir):
    """Independent recompute of the SA exact-substring decontamination:
    suffixes sorted (d14 order), per-boundary LCP capped at 2048; for
    every EVAL suffix (doc_id % 37 == 0) the longest prefix shared
    with ANY train suffix = max over the two directional gated-min
    scans (state := INF at a train suffix, min(state, boundary lcp) at
    an eval suffix); spans >= 32 union-merge per eval doc."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    rows = list(zip(docs.column("doc_id").to_pylist(),
                    docs.column("source").to_pylist(),
                    docs.column("text").to_pylist()))
    sufs = sorted(((text[o:], did, o)
                   for did, _, text in rows for o in range(len(text))),
                  key=lambda t: (t[0], t[1], t[2]))
    n = len(sufs)
    lcps = [0] * (n + 1)  # lcps[i] = boundary between i-1 and i
    for i in range(1, n):
        s1, s2 = sufs[i - 1][0], sufs[i][0]
        m = min(len(s1), len(s2), 2048)
        l = 0
        while l < m and s1[l] == s2[l]:
            l += 1
        lcps[i] = l
    INF = 1 << 60
    best = [0] * n
    state = -1  # no train seen yet
    for i in range(n):  # left-to-right: nearest train at smaller rank
        if sufs[i][1] % 37 != 0:
            state = INF
        else:
            state = -1 if state == -1 else min(state, lcps[i])
            if state > best[i]:
                best[i] = state
    state = -1
    for i in range(n - 1, -1, -1):  # right-to-left: boundary i+1
        if sufs[i][1] % 37 != 0:
            state = INF
        else:
            state = -1 if state == -1 else min(state, lcps[i + 1])
            if state > best[i]:
                best[i] = state
    spans = {}
    for i in range(n):
        if best[i] >= 32:
            _, did, o = sufs[i]
            spans.setdefault(did, []).append((o, o + best[i]))
    out_id, out_src, out_nc, out_cc, out_ns = [], [], [], [], []
    for did, src, text in sorted(rows):
        if did % 37 != 0:
            continue
        merged = []
        for st, en in sorted(spans.get(did, [])):
            if merged and st <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], en)
            else:
                merged.append([st, en])
        out_id.append(did)
        out_src.append(src)
        out_nc.append(len(text))
        out_cc.append(sum(en - st for st, en in merged))
        out_ns.append(len(merged))
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "source": pa.array(out_src, pa.string()),
        "n_chars": pa.array(out_nc, pa.int64()),
        "n_contam_chars": pa.array(out_cc, pa.int64()),
        "n_spans": pa.array(out_ns, pa.int64()),
    })


def d18_train_decontamination(sf_dir):
    """d16's scans with the roles swapped + d15's stitch: for every
    TRAIN suffix (doc_id % 37 != 0) the longest prefix shared with ANY
    eval suffix (state := INF at an eval suffix, min(state, boundary
    lcp) at a train suffix, both scan directions); spans >= 32
    union-merge per train doc; cleaned text is the complement."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    rows = list(zip(docs.column("doc_id").to_pylist(),
                    docs.column("source").to_pylist(),
                    docs.column("text").to_pylist()))
    sufs = sorted(((text[o:], did, o)
                   for did, _, text in rows for o in range(len(text))),
                  key=lambda t: (t[0], t[1], t[2]))
    n = len(sufs)
    lcps = [0] * (n + 1)
    for i in range(1, n):
        s1, s2 = sufs[i - 1][0], sufs[i][0]
        m = min(len(s1), len(s2), 2048)
        l = 0
        while l < m and s1[l] == s2[l]:
            l += 1
        lcps[i] = l
    INF = 1 << 60
    best = [0] * n
    state = -1  # no eval seen yet
    for i in range(n):  # left-to-right: nearest eval at smaller rank
        if sufs[i][1] % 37 == 0:
            state = INF
        else:
            state = -1 if state == -1 else min(state, lcps[i])
            if state > best[i]:
                best[i] = state
    state = -1
    for i in range(n - 1, -1, -1):  # right-to-left: boundary i+1
        if sufs[i][1] % 37 == 0:
            state = INF
        else:
            state = -1 if state == -1 else min(state, lcps[i + 1])
            if state > best[i]:
                best[i] = state
    spans = {}
    for i in range(n):
        if best[i] >= 32:
            _, did, o = sufs[i]
            spans.setdefault(did, []).append((o, o + best[i]))
    out_id, out_src, out_nc, out_sc, out_tc = [], [], [], [], []
    for did, src, text in sorted(rows):
        if did % 37 == 0:
            continue
        merged = []
        for st, en in sorted(spans.get(did, [])):
            if merged and st <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], en)
            else:
                merged.append([st, en])
        pieces, pos = [], 0
        for st, en in merged:
            pieces.append(text[pos:st])
            pos = en
        pieces.append(text[pos:])
        out_id.append(did)
        out_src.append(src)
        out_nc.append(len(text))
        out_sc.append(sum(en - st for st, en in merged))
        out_tc.append("".join(pieces))
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "source": pa.array(out_src, pa.string()),
        "n_chars": pa.array(out_nc, pa.int64()),
        "n_scrubbed": pa.array(out_sc, pa.int64()),
        "text_clean": pa.array(out_tc, pa.string()),
    })


def d19_sa_probe_decontamination(sf_dir):
    """Independent recompute of the incremental SA probe: the batch is
    the engine's deterministic construction (one doc per corpus doc
    with doc_id % 53 == 7: novel filler framing two verbatim slices of
    the source text); corpus suffixes are sorted once, each batch
    suffix is BISECTED in, and the max LCP (capped 2048) of its two
    insertion neighbors is the longest prefix shared with ANY corpus
    suffix (nearest-in-SA-order is optimal); spans >= 32 union-merge
    per batch doc. A different algorithm than the engine's pruned-
    union gated-min scans — agreement checks semantics."""
    import bisect
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = list(zip(docs.column("doc_id").to_pylist(),
                    docs.column("text").to_pylist()))
    corpus = sorted(text[o:] for _, text in rows for o in range(len(text)))
    n = len(corpus)

    def lcp(a, b):
        m = min(len(a), len(b), 2048)
        l = 0
        while l < m and a[l] == b[l]:
            l += 1
        return l

    out_id, out_nc, out_cc, out_ns = [], [], [], []
    for did, text in sorted(rows):
        if did % 53 != 7:
            continue
        bt = (f"novel-head-{did}-xq " + text[10:10 + 40 + did % 160]
              + f" plugh-{did}-mid " + text[210:210 + 24 + did % 64]
              + " novel-tail-zz")
        spans = []
        for o in range(len(bt)):
            s = bt[o:]
            i = bisect.bisect_left(corpus, s)
            m = 0
            if i > 0:
                m = lcp(s, corpus[i - 1])
            if i < n:
                m = max(m, lcp(s, corpus[i]))
            if m >= 32:
                spans.append((o, o + m))
        merged = []
        for st, en in sorted(spans):
            if merged and st <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], en)
            else:
                merged.append([st, en])
        out_id.append(did)
        out_nc.append(len(bt))
        out_cc.append(sum(en - st for st, en in merged))
        out_ns.append(len(merged))
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "n_chars": pa.array(out_nc, pa.int64()),
        "n_contam_chars": pa.array(out_cc, pa.int64()),
        "n_spans": pa.array(out_ns, pa.int64()),
    })


def c16_pipeline_substr(sf_dir):
    """Funnel oracle for c16: d15's substring removal (shared
    _d15_rows suffix sort) composed with the c11-battery gate, exact
    dedup of cleaned texts (min-doc_id keeper), and the Knuth 80/10/10
    split — stage manifest (stage, n_units, n_chars, n_tokens) with
    whitespace tokens, mirroring the engine's stage algebra."""
    d15 = _d15_rows(sf_dir)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])
    raw = list(zip(docs.column("doc_id").to_pylist(),
                   docs.column("text").to_pylist(),
                   docs.column("n_chars").to_pylist()))

    def ws(t):
        return [x for x in t.split(" ") if x != ""]

    def gate3(t):
        toks = ws(t)
        w, dw = len(toks), len(set(toks))
        ns = len(t.replace(" ", ""))
        padded = " " + t + " "
        sw = sum(1 for x in (" the ", " a ", " and ", " of ") if x in padded)
        g1 = 1 if 50 <= w <= 100000 else 0
        g2 = 1 if 3 * w <= ns <= 10 * w else 0
        g3 = 1 if sw >= 2 else 0
        g4 = 1 if 2 * dw >= w else 0
        return g1 + g2 + g3 + g4 >= 3

    cleaned = [(did, clean) for did, _, _, _, clean in d15]
    gated = [(did, t) for did, t in cleaned if gate3(t)]
    first = {}
    for did, t in sorted(gated):
        if t not in first:
            first[t] = did
    keep = set(first.values())
    deduped = [(did, t) for did, t in gated if did in keep]
    stages = {}

    def add(stage, items):
        stages[stage] = (len(items),
                         sum(len(t) for _, t in items),
                         sum(len(ws(t)) for _, t in items))

    add("0_raw", [(did, t) for did, t, _ in raw])
    # 0_raw n_chars comes from the table column (the engine reads it)
    stages["0_raw"] = (len(raw), sum(nc for _, _, nc in raw),
                       stages["0_raw"][2])
    add("1_substr_removed", cleaned)
    add("2_gated", gated)
    add("3_deduped", deduped)
    buckets = {}
    for did, t in deduped:
        b = (did * 2654435761) % 4294967296 % 10
        name = "4_train" if b < 8 else ("4_val" if b == 8 else "4_test")
        buckets.setdefault(name, []).append((did, t))
    for name, items in buckets.items():
        add(name, items)
    names = sorted(stages)
    return pa.table({
        "stage": pa.array(names, pa.string()),
        "n_units": pa.array([stages[n][0] for n in names], pa.int64()),
        "n_chars": pa.array([stages[n][1] for n in names], pa.int64()),
        "n_tokens": pa.array([stages[n][2] for n in names], pa.int64()),
    })


PY_ORACLES = {
    "d14_longest_dup_substrings": d14_longest_dup_substrings,
    "c16_pipeline_substr": c16_pipeline_substr,
    "d15_substring_removal": d15_substring_removal,
    "d16_exact_decontamination": d16_exact_decontamination,
    "d18_train_decontamination": d18_train_decontamination,
    "d19_sa_probe_decontamination": d19_sa_probe_decontamination,
    # the at-ingest twin's per-doc outputs union to the one-shot
    # report exactly (foreachBatch class — no windowed state), so the
    # same independent bisect recompute states the check
    "d19_probe_stream": d19_sa_probe_decontamination,
    # persisted-SA report == fresh d14 (deterministic construction),
    # so d14's independent suffix sort is the oracle here too — the
    # t26→t24 precedent
    "d17_sa_index_report": d14_longest_dup_substrings,
    "d03_lsh_candidates": d03_lsh_candidates,
    "d04_simhash_pairs": d04_simhash_pairs,
    "g03_connected_components": g03_connected_components,
    "m01_media_features": m01_media_features,
    "t06_doc_fingerprints": t06_doc_fingerprints,
    "t07_bpe_token_stats": t07_bpe_token_stats,
    "m03_audio_features": m03_audio_features,
    "m08_audio_decimate": m08_audio_decimate,
    "m04_image_phash": m04_image_phash,
    "m09_image_neardup": m09_image_neardup,
    "m05_pixel_stats": m05_pixel_stats,
    "m07_frame_pixels": m07_frame_pixels,
    "s05_pq_adc_topk": s05_pq_adc_topk,
}
