"""Prototype harness for the q100 BPE recursive-CTE oracle — compares
the DuckDB recursion against the Python reference trainer/encoder on the
real testdata before the SQL is committed as the registry oracle."""
import sys

import duckdb

sys.path.insert(0, ".")
from otokuna_spark.operators.bpe import END, _train_driver

BPE_ORACLE = r"""
WITH RECURSIVE
wf AS (
    SELECT w, list_append(string_split(w, ''), '</w>') AS syms, COUNT(*) AS freq
    FROM (SELECT UNNEST(string_split_regex(TRIM(text), '\s+')) AS w FROM documents)
    GROUP BY w
),
train(r, w, syms, freq, ma, mb) AS (
    SELECT 0, w, syms, freq, NULL::VARCHAR, NULL::VARCHAR FROM wf
    UNION ALL
    SELECT z.r + 1, z.w,
           list(z.emit ORDER BY z.pos) FILTER (z.emit IS NOT NULL),
           z.freq, z.a, z.b
    FROM (
        SELECT y.*,
               CASE WHEN y.sel THEN y.a || y.b
                    WHEN COALESCE(LAG(y.sel) OVER (PARTITION BY y.w ORDER BY y.pos), FALSE) THEN NULL
                    ELSE y.sym END AS emit
        FROM (
            SELECT x.*,
                   x.m AND ((x.pos - (COALESCE(MAX(CASE WHEN NOT x.m THEN x.pos END)
                       OVER (PARTITION BY x.w ORDER BY x.pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) + 1)) % 2 = 0) AS sel
            FROM (
                SELECT t2.r, t2.w, t2.freq, t2.a, t2.b, i.pos, t2.syms[i.pos] AS sym,
                       COALESCE(t2.syms[i.pos] = t2.a AND t2.syms[i.pos + 1] = t2.b, FALSE) AS m
                FROM (
                    SELECT t.*, best.a, best.b
                    FROM train t CROSS JOIN (
                        SELECT s.syms[s.pos] AS a, s.syms[s.pos + 1] AS b,
                               SUM(s.freq) AS cnt
                        FROM (SELECT s0.syms, s0.freq,
                                     UNNEST(range(1, len(s0.syms))) AS pos
                              FROM train s0) s(syms, freq, pos)
                        GROUP BY 1, 2
                        ORDER BY cnt DESC, a ASC, b ASC
                        LIMIT 1
                    ) best
                    WHERE t.r < 24 AND best.cnt >= 2
                ) t2, UNNEST(range(1, len(t2.syms) + 1)) i(pos)
            ) x
        ) y
    ) z
    GROUP BY z.r, z.w, z.freq, z.a, z.b
),
final AS (SELECT w, len(syms) AS n_sym FROM train WHERE r = (SELECT MAX(r) FROM train)),
docw AS (
    SELECT doc_id, UNNEST(string_split_regex(TRIM(text), '\s+')) AS w FROM documents
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(f.n_sym) AS BIGINT) AS n_bpe_tokens
FROM docw d JOIN final f USING (w)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def ref_encode_len(word: str, ranks: dict) -> int:
    s = list(word) + [END]
    while len(s) >= 2:
        best, best_rank = None, None
        for j in range(len(s) - 1):
            r = ranks.get((s[j], s[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = j, r
        if best is None:
            break
        a, b = s[best], s[best + 1]
        j, merged = 0, []
        while j < len(s):
            if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                merged.append(a + b)
                j += 2
            else:
                merged.append(s[j])
                j += 1
        s = merged
    return len(s)


def main(sf_dir: str) -> int:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = con.execute(
        "SELECT w, COUNT(*) FROM (SELECT UNNEST(string_split_regex(TRIM(text),"
        " '\\s+')) AS w FROM documents) GROUP BY w"
    ).fetchall()
    vocab = {tuple(list(w) + [END]): f for w, f in rows}
    merges = _train_driver(vocab, 24, 2)
    ranks = {p: i for i, p in enumerate(merges)}

    got = con.execute(BPE_ORACLE).fetchall()
    # cross-check the learned merge sequence too
    sql_merges = con.execute(
        BPE_ORACLE.replace(
            "SELECT d.doc_id,\n       CAST(COUNT(*) AS BIGINT) AS n_words,\n"
            "       CAST(SUM(f.n_sym) AS BIGINT) AS n_bpe_tokens\n"
            "FROM docw d JOIN final f USING (w)\nGROUP BY d.doc_id\nORDER BY d.doc_id",
            "SELECT DISTINCT r, ma, mb FROM train WHERE r >= 1 ORDER BY r",
        )
    ).fetchall()
    sql_merge_list = [(a, b) for _, a, b in sql_merges]
    assert sql_merge_list == merges, (
        f"merge sequence mismatch:\nSQL: {sql_merge_list}\nREF: {merges}"
    )
    print(f"merge sequence matches reference ({len(merges)} merges)")

    exp = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    bad = 0
    for (doc_id, nw, nb), (d2, text) in zip(got, exp):
        assert doc_id == d2
        words = text.split()
        enb = sum(ref_encode_len(w, ranks) for w in words)
        if nw != len(words) or nb != enb:
            bad += 1
            if bad < 5:
                print("MISMATCH", doc_id, (nw, nb), (len(words), enb))
    print(f"{len(got)} docs compared, {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
