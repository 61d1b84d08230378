"""DuckDB oracle SQL generators for the hash-based dedup / ANN / text queries.

The Spark queries and these SQL twins share every constant: the seeded
minhash coefficients (`dedup._minhash_coeffs`), the seeded hyperplanes
(`similarity._planes`), the Mersenne modulus, and the portable md5-derived
hash (`portable.phash64` / `phash64_sql`). Both sides therefore compute the
same integers/doubles bit-for-bit and the driver's value-hash comparison is
exact — these are real oracles, not rows-only checks.

Everything here is plain ANSI-ish DuckDB SQL over the driver-registered
views (documents, embeddings); the strings are generated because 32 minhash
aggregates / 60 simhash vote columns are not worth writing by hand.
"""

from __future__ import annotations

from pentaho_kettle_spark.functions.dedup import _MERSENNE, _minhash_coeffs
from pentaho_kettle_spark.functions.portable import phash64_sql
from pentaho_kettle_spark.functions.similarity import _planes

# Normalized text + word array, shared by every shingling oracle.
_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


def _shingle_cte(k: int) -> str:
    """CTE producing (doc_id, shingles LIST<BIGINT>) — the twin of
    dedup._shingles: word k-grams hashed with the portable hash, distinct;
    whole-text hash when fewer than k words."""
    gram = phash64_sql(f"array_to_string(w[i:i+{k - 1}], ' ')")
    whole = phash64_sql("norm")
    return f"""
      base AS (SELECT doc_id, n_chars, {_NORM} AS norm FROM documents),
      wrds AS (SELECT doc_id, n_chars, norm, string_split(norm, ' ') AS w FROM base),
      sh AS (
        SELECT doc_id, n_chars,
               CASE WHEN len(w) >= {k}
                    THEN list_distinct(list_transform(range(1, len(w) - {k} + 2),
                                                      i -> {gram}))
                    ELSE [{whole}] END AS shingles
        FROM wrds)
    """


def minhash_keep_sql(num_hashes: int = 32, bands: int = 8, k_shingle: int = 5) -> str:
    coeffs = _minhash_coeffs(num_hashes)
    rows_per_band = num_hashes // bands
    mins = ",\n            ".join(
        f"min((sm * {a} + {b}) % {_MERSENNE}) AS h{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_selects = []
    for b in range(bands):
        hs = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        cat = " || ',' || ".join(f"{h}::VARCHAR" for h in hs)
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {phash64_sql(cat)} AS bucket FROM sig"
        )
    band_rows = "\n          UNION ALL ".join(band_selects)
    return f"""
        WITH {_shingle_cte(k_shingle)},
        ex AS (SELECT doc_id, unnest(shingles) % {_MERSENNE} AS sm FROM sh),
        sig AS (
          SELECT doc_id,
            {mins}
          FROM ex GROUP BY doc_id),
        band_rows AS (
          {band_rows}),
        rep AS (SELECT band, bucket, min(doc_id) AS rep
                FROM band_rows GROUP BY band, bucket),
        dup AS (SELECT DISTINCT br.doc_id
                FROM band_rows br JOIN rep USING (band, bucket)
                WHERE br.doc_id <> rep.rep)
        SELECT d.doc_id, d.n_chars FROM documents d ANTI JOIN dup USING (doc_id)
    """


def minhash_clusters_sql(num_hashes: int = 32, bands: int = 8, k_shingle: int = 5) -> str:
    """Twin of minhash_lsh_edges + connected_components: the same per-bucket
    star edges, then component = min reachable node via a recursive
    transitive closure (exact — fine at oracle scale; the Spark side uses
    log-round label propagation instead)."""
    coeffs = _minhash_coeffs(num_hashes)
    rows_per_band = num_hashes // bands
    mins = ",\n            ".join(
        f"min((sm * {a} + {b}) % {_MERSENNE}) AS h{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_selects = []
    for b in range(bands):
        hs = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        cat = " || ',' || ".join(f"{h}::VARCHAR" for h in hs)
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {phash64_sql(cat)} AS bucket FROM sig"
        )
    band_rows = "\n          UNION ALL ".join(band_selects)
    return f"""
        WITH RECURSIVE {_shingle_cte(k_shingle)},
        ex AS (SELECT doc_id, unnest(shingles) % {_MERSENNE} AS sm FROM sh),
        sig AS (
          SELECT doc_id,
            {mins}
          FROM ex GROUP BY doc_id),
        band_rows AS (
          {band_rows}),
        rep AS (SELECT band, bucket, min(doc_id) AS rep
                FROM band_rows GROUP BY band, bucket),
        e0 AS (SELECT DISTINCT br.doc_id AS a, rep.rep AS b
               FROM band_rows br JOIN rep USING (band, bucket)
               WHERE br.doc_id <> rep.rep),
        edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        reach(s, t) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.s, e.b FROM reach r JOIN edges e ON r.t = e.a)
        SELECT s AS node, least(s, min(t)) AS component
        FROM reach GROUP BY s
    """


def simhash_candidates_sql(
    max_hamming: int = 8, k_shingle: int = 3, n_bits: int = 60, n_chunks: int = 4
) -> str:
    chunk_bits = n_bits // n_chunks
    mask = (1 << chunk_bits) - 1
    votes = ",\n            ".join(
        f"sum(CASE WHEN (s >> {b}) & 1 <> 0 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(n_bits)
    )
    assemble = "\n             + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(n_bits)
    )
    chunk_rows = "\n          UNION ALL ".join(
        f"SELECT doc_id, sim, {i} AS chunk, (sim >> {i * chunk_bits}) & {mask} AS v FROM sh2"
        for i in range(n_chunks)
    )
    return f"""
        WITH {_shingle_cte(k_shingle)},
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        votes AS (
          SELECT doc_id,
            {votes}
          FROM ex GROUP BY doc_id),
        sh2 AS (SELECT doc_id,
               ({assemble})::BIGINT AS sim
           FROM votes),
        chunks AS (
          {chunk_rows})
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
               bit_count(xor(l.sim, r.sim))::BIGINT AS hamming
        FROM chunks l JOIN chunks r
          ON l.chunk = r.chunk AND l.v = r.v AND l.doc_id < r.doc_id
        WHERE bit_count(xor(l.sim, r.sim)) <= {max_hamming}
    """


def ngram_jaccard_sql(
    k_shingle: int = 3,
    min_jaccard: float = 0.2,
    max_shingles_per_doc: int = 512,
    id_filter: str = "doc_id < 200",
    max_doc_freq: int | None = None,
) -> str:
    if max_doc_freq is None:
        ex_cte = "ex AS (SELECT doc_id, len(shc) AS n, unnest(shc) AS s FROM capped)"
    else:
        # mirror the engine's stop-shingle cap: drop shingles with document
        # frequency > max_doc_freq, then recompute per-doc sizes over the
        # retained universe
        ex_cte = f"""ex0 AS (SELECT doc_id, unnest(shc) AS s FROM capped),
        kept AS (
          SELECT doc_id, s FROM ex0
          WHERE s NOT IN (
            SELECT s FROM ex0 GROUP BY s HAVING count(*) > {max_doc_freq})),
        ex AS (
          SELECT k.doc_id, sz.n, k.s
          FROM kept k
          JOIN (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id) sz
            ON k.doc_id = sz.doc_id)"""
    return f"""
        WITH {_shingle_cte(k_shingle)},
        capped AS (
          SELECT doc_id,
                 list_sort(shingles)[1:{max_shingles_per_doc}] AS shc
          FROM sh WHERE {id_filter}),
        {ex_cte},
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
                 count(*) AS i
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               floor(i / (na + nb - i) * 1000000 + 0.5) / 1000000 AS jaccard
        FROM inter
        WHERE floor(i / (na + nb - i) * 1000000 + 0.5) / 1000000 >= {min_jaccard}
    """


def decontaminate_sql(
    k_shingle: int = 8,
    min_hits: int = 1,
    corpus_filter: str = "doc_id % 37 <> 0",
    bench_filter: str = "doc_id % 37 = 0",
) -> str:
    """Twin of dedup.decontaminate over the documents view: benchmark =
    rows matching bench_filter, corpus = rows matching corpus_filter."""
    return f"""
        WITH {_shingle_cte(k_shingle)},
        bench AS (
          SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE {bench_filter}),
        ex AS (
          SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s
          FROM sh WHERE {corpus_filter}),
        hits AS (
          SELECT e.doc_id, e.n, count(b.s) AS n_hits
          FROM ex e LEFT JOIN bench b ON e.s = b.s
          GROUP BY e.doc_id, e.n)
        SELECT doc_id,
               n::BIGINT AS n_grams,
               n_hits::BIGINT AS n_hits,
               floor(n_hits / n * 1000000 + 0.5) / 1000000 AS hit_ratio,
               (n_hits >= {min_hits})::BIGINT AS contaminated
        FROM hits
    """


def gopher_quality_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_2gram_share: float = 0.20,
) -> str:
    """Twin of text.gopher_quality over the documents view. The Spark side
    computes repetition metrics with sorted-array neighbour expressions
    (zero shuffles); the oracle takes the equivalent unnest+groupby road —
    values match because both count occurrences per (doc, line) / (doc,
    2-gram) and round ratios floor-form to 6 dp."""
    stops = "'the','be','to','of','and','that','have','with'"
    return rf"""
        WITH base AS (
          SELECT doc_id, text,
            list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        x -> x <> '') AS words,
            list_filter(string_split(text, chr(10)),
                        x -> trim(x) <> '') AS lines
          FROM documents),
        scal AS (
          SELECT doc_id,
            len(words)::BIGINT AS n_words,
            length(regexp_replace(text, '\s', '', 'g'))::DOUBLE AS nonspace,
            len(list_filter(words,
                x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE AS alpha_words,
            len(regexp_extract_all(text, '(#|\.\.\.)'))::DOUBLE AS symbols,
            len(list_filter([{stops}],
                s -> list_contains(words, s)))::BIGINT AS stop_hits,
            len(lines)::BIGINT AS n_lines
          FROM base),
        lx AS (SELECT doc_id, unnest(lines) AS line FROM base),
        lagg AS (
          SELECT doc_id, line, count(*) AS cnt, length(line) AS clen
          FROM lx GROUP BY doc_id, line),
        lstats AS (
          SELECT doc_id,
            sum(cnt - 1)::DOUBLE AS extras,
            sum(CASE WHEN cnt > 1 THEN cnt * clen ELSE 0 END)::DOUBLE
              AS member_chars,
            sum(cnt * clen)::DOUBLE AS total_chars
          FROM lagg GROUP BY doc_id),
        gx AS (
          SELECT doc_id, words[i] || ' ' || words[i + 1] AS gram
          FROM (SELECT doc_id, words, unnest(range(1, len(words))) AS i
                FROM base)),
        gagg AS (SELECT doc_id, gram, count(*) AS cnt
                 FROM gx GROUP BY doc_id, gram),
        gstats AS (
          SELECT doc_id, max(cnt)::DOUBLE AS top_cnt,
                 sum(cnt)::DOUBLE AS n_grams
          FROM gagg GROUP BY doc_id),
        m AS (
          SELECT s.doc_id, s.n_words,
            CASE WHEN s.n_words > 0 THEN
              floor(s.nonspace / s.n_words * 1000000 + 0.5) / 1000000
            ELSE 0.0 END AS mean_word_len,
            CASE WHEN s.n_words > 0 THEN
              floor(s.alpha_words / s.n_words * 1000000 + 0.5) / 1000000
            ELSE 0.0 END AS frac_alpha_words,
            CASE WHEN s.n_words > 0 THEN
              floor(s.symbols / s.n_words * 1000000 + 0.5) / 1000000
            ELSE 0.0 END AS symbol_ratio,
            s.stop_hits, s.n_lines,
            CASE WHEN s.n_lines > 0 THEN
              floor(coalesce(l.extras, 0) / s.n_lines * 1000000 + 0.5)
                / 1000000
            ELSE 0.0 END AS dup_line_frac,
            CASE WHEN coalesce(l.total_chars, 0) > 0 THEN
              floor(l.member_chars / l.total_chars * 1000000 + 0.5) / 1000000
            ELSE 0.0 END AS dup_line_char_frac,
            CASE WHEN coalesce(g.n_grams, 0) > 0 THEN
              floor(g.top_cnt / g.n_grams * 1000000 + 0.5) / 1000000
            ELSE 0.0 END AS top_2gram_share
          FROM scal s
          LEFT JOIN lstats l USING (doc_id)
          LEFT JOIN gstats g USING (doc_id))
        SELECT m.*,
          (m.n_words >= {min_words} AND m.n_words <= {max_words}
           AND m.mean_word_len >= {min_mean_word_len}
           AND m.mean_word_len <= {max_mean_word_len}
           AND m.symbol_ratio <= {max_symbol_ratio}
           AND m.frac_alpha_words >= {min_alpha_word_frac}
           AND m.stop_hits >= {min_stop_hits}
           AND m.dup_line_frac <= {max_dup_line_frac}
           AND m.dup_line_char_frac <= {max_dup_line_char_frac}
           AND m.top_2gram_share <= {max_top_2gram_share})::BIGINT
            AS gopher_pass
        FROM m
    """


def stratified_sample_sql(
    strata: str = "lang",
    n_per_stratum: int = 30,
    oversample: float = 2.0,
    cols: str = "doc_id, text, lang, source, n_chars",
) -> str:
    """Twin of sampling.stratified_sample over the documents view (strata
    is a comma list of stratum columns)."""
    h = phash64_sql("doc_id")
    cap = float(oversample) * n_per_stratum
    return f"""
        WITH c AS (
          SELECT {strata}, count(*) AS _n FROM documents GROUP BY {strata}),
        s AS (
          SELECT d.*, c._n,
                 (({h}) % 1000000 + 1000000) % 1000000 / 1000000.0 AS _u
          FROM documents d JOIN c USING ({strata})),
        f AS (
          SELECT * FROM s
          WHERE _u < least(1.0, {cap} / _n) OR _n <= {n_per_stratum}),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY {strata} ORDER BY _u, doc_id) AS _rn
          FROM f)
        SELECT {cols} FROM r WHERE _rn <= {n_per_stratum}
    """


def train_eval_split_sql(
    eval_frac: float = 0.1,
    salt: str = "split",
    cols: str = "doc_id, text, lang, source, n_chars",
) -> str:
    """Twin of sampling.train_eval_split over the documents view."""
    h = phash64_sql(f"'{salt}:' || doc_id::VARCHAR")
    return f"""
        SELECT {cols},
          CASE WHEN (({h}) % 1000000 + 1000000) % 1000000 / 1000000.0
                    < {eval_frac}
               THEN 'eval' ELSE 'train' END AS split
        FROM documents
    """


_STOPWORDS_SQL = "('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this')"
_LANG_SQL = {
    "en": "('the','and','of','to','is')",
    "de": "('der','die','und','das','ist')",
    "fr": "('le','la','les','et','est')",
    "es": "('el','la','los','que','es')",
}


def text_quality_sql() -> str:
    lang_hits = ",\n            ".join(
        f"len(list_filter(lwords, x -> x IN {m}))::BIGINT AS hits_{lang}"
        for lang, m in _LANG_SQL.items()
    )
    # tie-break = lexicographically greatest language code, mirroring Spark's
    # array_max over struct(hits, lang): check in descending lang order.
    best = """CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'und'
                   WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
                   WHEN hits_es = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'es'
                   WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
                   ELSE 'de' END"""
    fp = phash64_sql("norm")
    return rf"""
        WITH t AS (
          SELECT doc_id, text,
                 {_NORM} AS norm,
                 length(text)::DOUBLE AS len,
                 string_split_regex(lower(text), '\s+') AS lwords,
                 len(string_split_regex(trim(text), '\s+'))::BIGINT AS words_trim,
                 length(regexp_replace(text, '[^.,;:!?()\[\]]', '', 'g'))::BIGINT AS punct_n,
                 length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))::DOUBLE AS nonalnum
          FROM documents),
        feats AS (
          SELECT doc_id, norm, len,
            (words_trim + punct_n)::BIGINT AS n_tokens,
            len(lwords)::DOUBLE AS n_words,
            len(list_filter(lwords, x -> x IN {_STOPWORDS_SQL}))::DOUBLE AS stop_hits,
            nonalnum,
            {lang_hits}
          FROM t),
        q AS (
          SELECT doc_id, norm, n_tokens,
            CASE WHEN n_words > 0 THEN stop_hits / n_words ELSE 0.0 END AS stop_ratio,
            nonalnum / greatest(len, 1.0) AS punct_ratio,
            least(len / 500.0, 1.0) AS len_score,
            CASE WHEN n_words > 0 THEN len / n_words ELSE 0.0 END AS avg_word,
            hits_en, hits_de, hits_fr, hits_es
          FROM feats)
        SELECT doc_id, n_tokens,
          floor((0.4 * len_score
                 + 0.2 * (1 - least(punct_ratio * 4, 1.0))
                 + 0.2 * least(stop_ratio * 5, 1.0)
                 + 0.2 * (CASE WHEN avg_word >= 3 AND avg_word <= 12
                               THEN 1.0 ELSE 0.3 END)) * 1000000 + 0.5) / 1000000
            AS quality,
          {best} AS lang_pred,
          {fp} AS fingerprint
        FROM q
    """


def _bucket_sql(vexpr: str, planes: list[list[float]]) -> str:
    """Hyperplane sign-pattern bucket — the twin of
    similarity.hyperplane_bucket with the same seeded plane literals."""
    terms = []
    for i, p in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in p)
        terms.append(
            f"(CASE WHEN list_dot_product({vexpr}, [{lits}]) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return "(" + "\n             + ".join(terms) + ")::BIGINT"


def lsh_ann_sql(k: int = 5, n_planes: int = 6, dim: int = 64) -> str:
    planes = _planes(dim, n_planes)

    def bucket(vexpr: str) -> str:
        return _bucket_sql(vexpr, planes)

    return f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 3),
        cb AS (SELECT vec_id, v, {bucket("v")} AS bkt FROM c),
        qb AS (SELECT query_id, qv, {bucket("qv")} AS bkt FROM q),
        scored AS (
          SELECT query_id, vec_id,
                 list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
                   AS cos_raw
          FROM cb JOIN qb USING (bkt))
        SELECT query_id, vec_id, floor(cos_raw * 100000 + 0.5) / 100000 AS cosine
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, vec_id) <= {k}
    """


def embedding_near_dups_sql(
    min_cosine: float = 0.2, n_planes: int = 6, dim: int = 64
) -> str:
    planes = _planes(dim, n_planes)
    return f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cb AS (SELECT vec_id, v, {_bucket_sql("v", planes)} AS bkt FROM c),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 floor(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) * 100000 + 0.5)
                   / 100000 AS cosine
          FROM cb a JOIN cb b ON a.bkt = b.bkt AND a.vec_id < b.vec_id)
        SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {min_cosine}
    """


def multimodal_features_sql(id_filter: str = "doc_id < 100") -> str:
    """Twin of functions/multimodal.extract_media_features over the fake
    deterministic decode: payload = utf-8 bytes of text, digest = md5 hex,
    feature bytes = first 8 md5 digest bytes (stringified by the query)."""
    byte_i = "(('0x' || substr(md5(text), 2*i - 1, 2))::INT)::VARCHAR"
    return f"""
        SELECT doc_id::BIGINT AS media_id,
               'image' AS kind,
               strlen(text)::BIGINT AS n_bytes,
               md5(text) AS digest,
               array_to_string(list_transform(range(1, 9), i -> {byte_i}), ',')
                 AS feature_bytes,
               TRUE AS decode_ok
        FROM documents WHERE {id_filter}
    """


def ivf_ann_sql(
    k: int = 5, n_cells: int = 16, n_probe: int = 2, query_filter: str = "vec_id < 3"
) -> str:
    """DuckDB twin of functions/similarity.ivf_topk with centroids=None:
    centroids = the n_cells lowest-id corpus vectors (cell id = rank by
    vec_id), argmax-cosine assignment with ties to the lowest cell, queries
    probe their n_probe nearest cells, exact cosine inside probed cells."""
    return f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
          FROM c ORDER BY vec_id LIMIT {n_cells}),
        assigned AS (
          SELECT vec_id, v, cell,
                 row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY list_dot_product(v, cv)
                            / (sqrt(list_dot_product(v, v))
                               * sqrt(list_dot_product(cv, cv))) DESC,
                            cell) AS rk
          FROM c CROSS JOIN cent),
        cb AS (SELECT vec_id, v, cell FROM assigned WHERE rk = 1),
        qprobe AS (
          SELECT vec_id AS query_id, v AS qv, cell
          FROM (SELECT a.vec_id, a.v, a.cell,
                       row_number() OVER (
                         PARTITION BY a.vec_id
                         ORDER BY list_dot_product(a.v, cv)
                                  / (sqrt(list_dot_product(a.v, a.v))
                                     * sqrt(list_dot_product(cv, cv))) DESC,
                                  a.cell) AS prk
                FROM (SELECT c2.vec_id, c2.v, cent.cell, cent.cv
                      FROM c c2 CROSS JOIN cent
                      WHERE c2.{query_filter}) a)
          WHERE prk <= {n_probe}),
        scored AS (
          SELECT query_id, cb.vec_id,
                 list_dot_product(cb.v, qv)
                   / (sqrt(list_dot_product(cb.v, cb.v))
                      * sqrt(list_dot_product(qv, qv))) AS cos_raw
          FROM cb JOIN qprobe USING (cell))
        SELECT query_id, vec_id, floor(cos_raw * 100000 + 0.5) / 100000 AS cosine
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, vec_id) <= {k}
    """
