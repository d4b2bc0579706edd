"""DuckDB oracle SQL generators for the corpus near-dup operators.

The engine's MinHash / SimHash / fingerprint kernels were deliberately
built from explicitly-specified integer arithmetic (rolling polynomial
hash mod 2^64, splitmix64 finalize, FNV-1a token hash, Mersenne-61
permutations) so that an independent ANSI-SQL implementation can reproduce
them bit-for-bit. These generators emit that SQL: 64-bit wraparound
multiplication is expressed over HUGEINT with 32-bit limb splitting
(x*c mod 2^64 = (xl*cl + ((xl*ch + xh*cl) mod 2^32)*2^32) mod 2^64, all
partials < 2^127), xors/shifts act on HUGEINT directly.

The oracles mirror geomesa_ray/stages/dedup.py (minhash_signature_batch,
simhash_batch) and stages/textstats.py (Fingerprinter) exactly; any
change to those kernels must be reflected here (the driver's correctness
gate will catch drift). They assume every document has at least
``shingle_k`` utf-8 bytes (true of the driver testdata) and that no LSH
bucket exceeds ``max_bucket_rows`` (the anchor-star path is a scale
fallback, not exercised at oracle scale).
"""

from __future__ import annotations

M64 = 18446744073709551616  # 2^64
M61 = 2305843009213693951  # 2^61 - 1
BASE = 1099511628211  # FNV prime: rolling-hash base AND band-fold multiplier
FNV_OFFSET = 14695981039346656037
SPLITMIX_C1 = 0x9E3779B97F4A7C15
SPLITMIX_C2 = 0xBF58476D1CE4E5B9
SPLITMIX_C3 = 0x94D049BB133111EB


def _mul64(x: str, c: int) -> str:
    """SQL for (x * c) mod 2^64 with x a HUGEINT column/expr < 2^64 and c a
    64-bit constant, via 32-bit limb splitting (HUGEINT-safe)."""
    c_lo, c_hi = c & 0xFFFFFFFF, c >> 32
    return (
        f"((({x}) % 4294967296) * {c_lo} + "
        f"(((({x}) % 4294967296) * {c_hi} + (({x}) // 4294967296) * {c_lo})"
        f" % 4294967296) * 4294967296) % {M64}"
    )


def _mul64_vars(x: str, y: str) -> str:
    """SQL for (x * y) mod 2^64 with BOTH operands HUGEINT columns < 2^64
    (full 32-bit limb split; every partial < 2^64 so HUGEINT-safe)."""
    return (
        f"((({x}) % 4294967296) * (({y}) % 4294967296) + "
        f"(((({x}) % 4294967296) * (({y}) // 4294967296) + "
        f"(({x}) // 4294967296) * (({y}) % 4294967296)) % 4294967296)"
        f" * 4294967296) % {M64}"
    )


def _shingle_ctes(k: int, table: str = "documents") -> str:
    """CTE chain producing ``shz(doc_id, i, z)``: the splitmix64-finalized
    rolling polynomial hash of every k-byte utf-8 shingle, with its
    0-based position i (mirrors dedup._shingle_hashes)."""
    pw = [1]
    for _ in range(k - 1):
        pw.append((pw[-1] * BASE) % M64)
    # window dot product: data[i+j] * base^(k-1-j)
    terms = " + ".join(
        f"CAST(b[i+{j + 1}] AS HUGEINT) * {pw[k - 1 - j]}" for j in range(k)
    )
    return f"""
byt AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM {table}
),
bl AS (
  SELECT doc_id, n,
         list_transform(range(0, n), j ->
           (strpos('0123456789ABCDEF', substr(hx, CAST(2*j+1 AS BIGINT), 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, CAST(2*j+2 AS BIGINT), 1)) - 1) AS b
  FROM byt
),
rawsh AS (
  SELECT doc_id,
         unnest(range(0, n - {k - 1})) AS i,
         unnest(list_transform(range(0, n - {k - 1}), i -> ({terms}) % {M64})) AS h
  FROM bl WHERE n >= {k}
),
smx1 AS (SELECT doc_id, i, (h + {SPLITMIX_C1}) % {M64} AS z0 FROM rawsh),
smx2 AS (SELECT doc_id, i, xor(z0, z0 >> 30) AS x0 FROM smx1),
smx3 AS (SELECT doc_id, i, {_mul64("x0", SPLITMIX_C2)} AS z1 FROM smx2),
smx4 AS (SELECT doc_id, i, xor(z1, z1 >> 27) AS x1 FROM smx3),
smx5 AS (SELECT doc_id, i, {_mul64("x1", SPLITMIX_C3)} AS z2 FROM smx4),
shz AS (SELECT doc_id, i, xor(z2, z2 >> 31) AS z FROM smx5)"""


def minhash_sig_ctes(num_perm: int = 128, shingle_k: int = 5, seed: int = 42,
                     bands: int = 16, table: str = "documents") -> str:
    """CTE chain ending in ``sig(doc_id, p, s)`` and ``bandkey(doc_id,
    band, acc)`` — the minhash signatures and banded LSH keys (mirrors
    dedup.minhash_signature_batch + MinHasher band fold)."""
    from geomesa_ray.stages.dedup import minhash_perm_params

    a, b = minhash_perm_params(num_perm, seed)
    rows = num_perm // bands
    perm_vals = ", ".join(
        f"({p}, {int(a[p])}, {int(b[p])})" for p in range(num_perm)
    )
    # unrolled band fold: acc_{r+1} = (acc_r * BASE + ss[r+1]) mod 2^64
    fold = ["f0 AS (SELECT doc_id, band, ss, CAST(0 AS HUGEINT) AS acc FROM bnd)"]
    for r in range(rows):
        fold.append(
            f"f{r + 1} AS (SELECT doc_id, band, ss, "
            f"({_mul64('acc', BASE)} + ss[{r + 1}]) % {M64} AS acc FROM f{r})"
        )
    return f"""{_shingle_ctes(shingle_k, table)},
h61 AS (SELECT DISTINCT doc_id, z % {M61} AS h FROM shz),
perms(p, a, b) AS (VALUES {perm_vals}),
sig AS MATERIALIZED (
  -- mirrors the numpy kernel exactly: the a*h product and the +b sum both
  -- WRAP mod 2^64 (uint64 arithmetic) before the final % M61
  SELECT doc_id, p,
         MIN((({_mul64_vars("CAST(a AS HUGEINT)", "h")} + b) % {M64}) % {M61}) AS s
  FROM h61 CROSS JOIN perms GROUP BY doc_id, p
),
bnd AS (
  SELECT doc_id, CAST(p // {rows} AS INTEGER) AS band, list(s ORDER BY p) AS ss
  FROM sig GROUP BY doc_id, p // {rows}
),
{", ".join(fold)},
bandkey AS MATERIALIZED (SELECT doc_id, band, acc FROM f{rows})"""


def minhash_pairs_sql(threshold: float = 0.5, num_perm: int = 128,
                      shingle_k: int = 5, seed: int = 42, bands: int = 16,
                      table: str = "documents") -> str:
    """Full oracle for minhash_lsh_pairs: (left_id, right_id, est_jaccard)
    sorted by pair."""
    return f"""
WITH {minhash_sig_ctes(num_perm, shingle_k, seed, bands, table)},
cand AS (
  SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id
  FROM bandkey l JOIN bandkey r
    ON l.band = r.band AND l.acc = r.acc AND l.doc_id < r.doc_id
),
est AS (
  SELECT c.left_id, c.right_id,
         SUM(CASE WHEN sl.s = sr.s THEN 1 ELSE 0 END) / {float(num_perm)} AS est_jaccard
  FROM cand c
  JOIN sig sl ON sl.doc_id = c.left_id
  JOIN sig sr ON sr.doc_id = c.right_id AND sr.p = sl.p
  GROUP BY c.left_id, c.right_id
)
SELECT left_id, right_id, est_jaccard FROM est
WHERE est_jaccard >= {threshold}
ORDER BY left_id, right_id"""


def dedup_keep_sql(threshold: float = 0.5, num_perm: int = 128,
                   shingle_k: int = 5, seed: int = 42, bands: int = 16,
                   table: str = "documents") -> str:
    """Oracle for the dedup_keep pipeline: doc_ids kept after MinHash-LSH
    pair finding + connected-component clustering (representative = min id
    of each component; singletons kept). Components via a recursive
    label-spread CTE, mirroring cluster_pairs_dataset."""
    return f"""
WITH RECURSIVE {minhash_sig_ctes(num_perm, shingle_k, seed, bands, table)},
cand AS (
  SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id
  FROM bandkey l JOIN bandkey r
    ON l.band = r.band AND l.acc = r.acc AND l.doc_id < r.doc_id
),
prs AS MATERIALIZED (
  SELECT c.left_id, c.right_id
  FROM cand c
  JOIN sig sl ON sl.doc_id = c.left_id
  JOIN sig sr ON sr.doc_id = c.right_id AND sr.p = sl.p
  GROUP BY c.left_id, c.right_id
  HAVING SUM(CASE WHEN sl.s = sr.s THEN 1 ELSE 0 END) / {float(num_perm)} >= {threshold}
),
edges AS MATERIALIZED (
  SELECT left_id AS src, right_id AS dst FROM prs
  UNION ALL
  SELECT right_id, left_id FROM prs
),
reach(node, lab) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, r.lab FROM reach r JOIN edges e ON e.dst = r.node
),
minlab AS (SELECT node, MIN(lab) AS lab FROM reach GROUP BY node)
SELECT d.doc_id FROM {table} d
LEFT JOIN minlab m ON m.node = d.doc_id
WHERE m.lab IS NULL OR m.lab = d.doc_id
ORDER BY d.doc_id"""


def simhash_pairs_sql(max_hamming: int = 3, max_token_bytes: int = 64,
                      table: str = "documents") -> str:
    """Oracle for simhash_pairs: (left_id, right_id, hamming) for pairs
    sharing ≥1 of the 4 16-bit bands with Hamming distance ≤ max_hamming
    (mirrors dedup.simhash_batch: RE2 \\w+ tokens of lower(text), seedless
    FNV-1a per token occurrence, per-bit ±1 votes, bit set iff sum > 0)."""
    fnv_step = _mul64("xor(acc, CAST(b AS HUGEINT))", BASE)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS t
  FROM {table}
),
th AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST({FNV_OFFSET} AS HUGEINT),
             list_transform(range(1, LEAST(length(t), {max_token_bytes}) + 1),
                            i -> ascii(substr(t, CAST(i AS BIGINT), 1)))),
           (acc, b) -> {fnv_step}) AS h
  FROM tok
),
votes AS (
  SELECT doc_id, u.bit,
         SUM(CASE WHEN (h >> u.bit) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) u
  GROUP BY doc_id, u.bit
),
sim0 AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << CAST(bit AS INTEGER)
                  ELSE CAST(0 AS HUGEINT) END) AS sh
  FROM votes GROUP BY doc_id
),
sim AS (
  SELECT d.doc_id, COALESCE(s.sh, CAST(0 AS HUGEINT)) AS sh
  FROM {table} d LEFT JOIN sim0 s ON s.doc_id = d.doc_id
),
sp AS (
  SELECT l.doc_id AS left_id, r.doc_id AS right_id,
         CAST(bit_count(CAST(xor(l.sh, r.sh) AS UBIGINT)) AS INTEGER) AS hamming
  FROM sim l JOIN sim r ON l.doc_id < r.doc_id AND (
       (l.sh % 65536) = (r.sh % 65536)
    OR ((l.sh >> 16) % 65536) = ((r.sh >> 16) % 65536)
    OR ((l.sh >> 32) % 65536) = ((r.sh >> 32) % 65536)
    OR ((l.sh >> 48) % 65536) = ((r.sh >> 48) % 65536))
)
SELECT DISTINCT left_id, right_id, hamming FROM sp
WHERE hamming <= {max_hamming}
ORDER BY left_id, right_id"""


def fingerprints_sql(k: int = 8, window: int = 16, table: str = "documents") -> str:
    """Oracle for the winnowing Fingerprinter: per-doc int64 fingerprint =
    XOR fold of the mixed winnowed sketch (mirrors textstats.Fingerprinter:
    k-byte shingles → sliding-window-{window} minima at positions
    0..c-window for docs with c > window shingles, deduped on consecutive
    value change; single whole-segment min for 0 < c ≤ window; FNV offset
    basis for shingle-less docs)."""
    off_signed = FNV_OFFSET - M64  # offset basis as int64 two's complement
    return f"""
WITH {_shingle_ctes(k, table)},
cnt AS (SELECT doc_id, COUNT(*) AS c FROM shz GROUP BY doc_id),
wmin AS (
  SELECT s.doc_id, s.i,
         MIN(s.z) OVER (PARTITION BY s.doc_id ORDER BY s.i
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS w
  FROM shz s JOIN cnt ON cnt.doc_id = s.doc_id
  WHERE cnt.c > {window}
  QUALIFY s.i <= cnt.c - {window}
),
kept_long AS (
  SELECT doc_id, w AS v FROM (
    SELECT doc_id, i, w,
           LAG(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw
    FROM wmin
  ) WHERE pw IS NULL OR w != pw
),
kept_short AS (
  SELECT s.doc_id, MIN(s.z) AS v
  FROM shz s JOIN cnt ON cnt.doc_id = s.doc_id
  WHERE cnt.c <= {window}
  GROUP BY s.doc_id
),
sketch AS (SELECT * FROM kept_long UNION ALL SELECT * FROM kept_short),
mx1 AS (SELECT doc_id, {_mul64("v", SPLITMIX_C1)} AS z1 FROM sketch),
mx2 AS (SELECT doc_id, xor(z1, z1 >> 29) AS z2 FROM mx1),
mx3 AS (SELECT doc_id, {_mul64("z2", SPLITMIX_C2)} AS z3 FROM mx2),
mx4 AS (SELECT doc_id, xor(z3, z3 >> 32) AS z4 FROM mx3),
fold AS (
  SELECT doc_id, bit_xor(CAST(z4 AS UBIGINT)) AS fp_u FROM mx4 GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN f.fp_u IS NULL THEN {off_signed}
                 WHEN f.fp_u >= 9223372036854775808
                   THEN CAST(f.fp_u AS HUGEINT) - {M64}
                 ELSE CAST(f.fp_u AS HUGEINT) END AS BIGINT) AS fingerprint
FROM {table} d LEFT JOIN fold f ON f.doc_id = d.doc_id
ORDER BY d.doc_id"""


def splitmix_ctes(src: str, id_col: str = "doc_id",
                  prefix: str = "b") -> str:
    """CTE chain ``{prefix}0..{prefix}5`` computing ``z = splitmix64(id)``
    over every column of ``src`` (mirrors corpus._splitmix64 with HUGEINT
    32-bit limb multiplication). Select from ``{prefix}5``; the hash is in
    column ``z``."""
    p = prefix
    return f"""{p}0 AS (
  SELECT *, (CAST({id_col} AS HUGEINT) + {SPLITMIX_C1}) % {M64} AS z0
  FROM {src}
),
{p}1 AS (SELECT *, xor(z0, z0 >> 30) AS x0 FROM {p}0),
{p}2 AS (SELECT *, {_mul64("x0", SPLITMIX_C2)} AS z1 FROM {p}1),
{p}3 AS (SELECT *, xor(z1, z1 >> 27) AS x1 FROM {p}2),
{p}4 AS (SELECT *, {_mul64("x1", SPLITMIX_C3)} AS z2 FROM {p}3),
{p}5 AS (SELECT *, xor(z2, z2 >> 31) AS z FROM {p}4)"""
