package graft.queries

import graft.queries.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-infrastructure operators: the clustering, layout, and reporting
  * primitives a 100 TB corpus build runs around the curation core —
  * each one a Catalyst-only plan with an exact DuckDB oracle twin.
  *
  * Scale notes (tested at sf, designed for 100 TB):
  *  - `q_grouping_sets` computes all requested subtotal grains in ONE
  *    pass (Spark expands grouping sets inside a single hash aggregate —
  *    no per-grain rescan of the corpus);
  *  - `q_winnowing` is linear in characters: one narrow k-gram explode,
  *    one per-doc window (partitioned — never a global sort), one
  *    hash-keyed self-join on the fingerprint digest (RefinedWeb-style
  *    df-join, skew bounded by the most-shared fingerprint);
  *  - `q_kmeans` is the canonical distributed Lloyd step: the k-row
  *    centroid table BROADCASTS (the corpus never moves), assignment is
  *    a map-side argmin, and the centroid update is a (cluster, dim)
  *    partial-agg — integer/fixed-point throughout so results are
  *    bit-identical cross-engine AND order-immune across partitionings;
  *  - `q_url_canonical` is a narrow projection (Spark's codegen'd
  *    `parse_url`) into one domain-keyed partial agg.
  *
  * Floats follow the repo's cross-engine discipline (see
  * [[graft.queries.Rounding]]): fixed-point integers for anything summed
  * across rows, `Rounding.r` on every reported double.
  */
object ScaleQueries {

  // --- grouping-sets subtotal report (one-pass multi-grain rollup) ----------
  //
  // The corpus-reporting grain trio (lang × source, lang, source) as ONE
  // aggregate via GROUPING SETS — distinct from q_cube/q_rollup, which
  // compute the full lattice/prefix chain; here the grains are an
  // arbitrary subset (the grand total deliberately excluded) and
  // `grouping_id()` disambiguates subtotal rows from real 'ALL' groups.

  private def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq(col("source"))),
        col("lang"), col("source"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("gid"), col("n_docs"), col("chars"))
      .orderBy("gid", "lang", "source")

  private val qGroupingSetsSql =
    """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
      |  CAST(GROUPING(lang, source) AS BIGINT) AS gid,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents
      |GROUP BY GROUPING SETS ((lang, source), (lang), (source))
      |ORDER BY gid, lang, source""".stripMargin

  // --- winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) --------------
  //
  // The MOSS document-fingerprinting scheme: hash every character k-gram,
  // slide a window of w consecutive hashes, keep the MINIMUM of each
  // window (rightmost on ties — the "robust" variant), dedupe the kept
  // (hash, position) pairs. Guarantees any shared substring of length
  // ≥ k + w − 1 yields at least one shared fingerprint — the exact-match
  // detector between q_doc_fingerprint's single min-hash and q_dup_spans'
  // full span table. The rightmost-tie argmin travels as ONE integer key
  // (hash·2²¹ + (2²⁰−1 − pos)) so both engines pick the identical
  // fingerprint without struct-ordering semantics. The synthetic corpus
  // has no natural shared substrings, so a deterministic footer is
  // appended to every 7th doc in BOTH engines (the q_paragraph_dedup
  // enrichment discipline) to exercise cross-doc sharing.

  private val WinnowFooter =
    "shared boilerplate span planted for winnowing overlap detection"
  private val WinK = 8 // k-gram length (chars)
  private val WinW = 4 // winnowing window (hashes)

  private def qWinnowing(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        concat(substring(lower(col("text")), 1, 384),
          when(pmod(col("doc_id"), lit(7)) === 0, lit(" " + WinnowFooter))
            .otherwise(lit(""))).as("s"))
      .filter(length(col("s")) >= WinK + WinW - 1)
    val kg = docs
      .withColumn("g", expr(s"transform(sequence(1, length(s) - ${WinK - 1}), i -> substring(s, i, $WinK))"))
      .select(col("doc_id"), size(col("g")).as("ng"),
        posexplode(col("g")).as(Seq("p0", "kgs")))
      .select(col("doc_id"), col("ng"), (col("p0") + 1).as("pos"),
        conv(substring(md5(col("kgs")), 1, 10), 16, 10).cast("long").as("h"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, WinW - 1)
    val fps = kg
      .withColumn("wkey",
        min(col("h") * lit(2097152L) + (lit(1048575L) - col("pos"))).over(w))
      .filter(col("pos") <= col("ng") - (WinW - 1))
      .select(col("doc_id"), expr("wkey div 2097152").as("h"),
        (lit(1048575L) - col("wkey") % lit(2097152L)).as("fpos"))
      .distinct()
      .persist()
    val byH = fps.groupBy("h").agg(countDistinct("doc_id").as("ndocs"))
    fps.join(byH, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_fp"), col("n_shared"),
        Rounding.r(col("n_shared") / col("n_fp").cast("double"), 4).as("share_frac"))
      .orderBy("doc_id")
  }

  private val qWinnowingSql =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    substr(lower(text), 1, 384) ||
       |      CASE WHEN doc_id % 7 = 0 THEN ' $WinnowFooter' ELSE '' END AS s
       |  FROM documents),
       |dd AS (SELECT doc_id, s FROM d WHERE len(s) >= ${WinK + WinW - 1}),
       |kg AS (
       |  SELECT doc_id, len(s) - ${WinK - 1} AS ng, u.pos AS pos,
       |    ('0x' || substr(md5(u.kg), 1, 10))::BIGINT AS h
       |  FROM (
       |    SELECT doc_id, s,
       |      unnest(list_transform(generate_series(1, len(s) - ${WinK - 1}),
       |        i -> {'pos': i, 'kg': substr(s, i, $WinK)})) AS u
       |    FROM dd) x),
       |wm AS (
       |  SELECT doc_id, ng, pos,
       |    min(h * 2097152 + (1048575 - pos)) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS wkey
       |  FROM kg),
       |fp AS (
       |  SELECT DISTINCT doc_id, wkey // 2097152 AS h,
       |    1048575 - (wkey % 2097152) AS fpos
       |  FROM wm WHERE pos <= ng - ${WinW - 1}),
       |byh AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM fp GROUP BY 1)
       |SELECT f.doc_id, count(*) AS n_fp,
       |  CAST(sum(CASE WHEN b.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |  ${Rounding.rSql("sum(CASE WHEN b.ndocs >= 2 THEN 1 ELSE 0 END) / count(*)::DOUBLE", 4)} AS share_frac
       |FROM fp f JOIN byh b ON f.h = b.h
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- distributed k-means (two Lloyd iterations, fixed-point exact) --------
  //
  // The canonical Spark clustering workload, shaped the way it scales:
  // the k-row centroid table broadcasts into a map-side argmin (the
  // corpus never shuffles for assignment), the update is a
  // (cluster, dim)-keyed partial agg, and TWO full Lloyd iterations run
  // unrolled so the oracle can mirror them as chained CTEs. Everything
  // that crosses rows is INTEGER: coordinates fix-point at 2^20 (exact —
  // a float's 24-bit mantissa times 2^20 is an exact double), squared-L2
  // distances are exact BIGINTs, the argmin travels as dist·16 + cid so
  // ties break to the lowest cluster id in both engines, and the
  // centroid mean is floor(sum/n) on doubles well under 2^53. Init is
  // the k lowest md5(vec_id) vectors — deterministic, order-immune,
  // uniformly spread.

  private val KmK = 8

  private def kmAssign(fp: DataFrame, cents: DataFrame): DataFrame =
    fp.crossJoin(broadcast(cents))
      .withColumn("dist",
        expr("aggregate(zip_with(x, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"))
      .groupBy("vec_id")
      .agg(min(col("dist") * lit(16L) + col("cid")).as("key"))
      .select(col("vec_id"), expr("key div 16").as("dist"),
        (col("key") % 16).cast("long").as("cid"))

  private def kmUpdate(assigned: DataFrame, fp: DataFrame): DataFrame =
    assigned.join(fp, "vec_id")
      .select(col("cid"), posexplode(col("x")).as(Seq("dim", "v")))
      .groupBy("cid", "dim")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .withColumn("mfp", floor(col("sv").cast("double") / col("n")).cast("long"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(dim, mfp))), t -> t.mfp)").as("c"))

  private def qKmeans(s: SparkSession, dir: String): DataFrame = {
    // persisted: the fixed-point projection feeds init + both assignment
    // passes + the centroid update
    val fp = t(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT))").as("x"))
      .persist()
    val seed = fp
      .withColumn("m", md5(col("vec_id").cast("string")))
      .orderBy("m", "vec_id").limit(KmK)
    val c1 = seed
      .withColumn("cid",
        (row_number().over(Window.orderBy("m", "vec_id")) - 1).cast("long"))
      .select(col("cid"), col("x").as("c"))
    val c2 = kmUpdate(kmAssign(fp, c1), fp)
    val a2 = kmAssign(fp, c2)
    val cl1 = c2.select(col("cid"),
      expr("aggregate(c, 0L, (acc, v) -> acc + abs(v))").as("c_l1"))
    a2.groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"), sum("dist").as("inertia"))
      .join(broadcast(cl1), "cid")
      .select(col("cid").as("cluster"), col("n_vecs"), col("inertia"), col("c_l1"))
      .orderBy("cluster")
  }

  private val qKmeansSql =
    s"""WITH fp AS (
       |  SELECT vec_id,
       |    list_transform(embedding, v -> CAST(floor(v::DOUBLE * 1048576.0) AS BIGINT)) AS x
       |  FROM embeddings),
       |sd AS (
       |  SELECT vec_id, x FROM fp
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $KmK),
       |c1 AS (
       |  SELECT CAST(row_number() OVER (
       |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) - 1 AS cid,
       |    x AS c
       |  FROM sd),
       |a1 AS (
       |  SELECT f.vec_id,
       |    min(CAST(list_sum(list_transform(generate_series(1, len(f.x)),
       |      i -> (f.x[i] - c.c[i]) * (f.x[i] - c.c[i]))) AS BIGINT) * 16 + c.cid) AS key
       |  FROM fp f CROSS JOIN c1 c GROUP BY 1),
       |a1d AS (SELECT vec_id, key // 16 AS dist, key % 16 AS cid FROM a1),
       |ex AS (
       |  SELECT cid, u.dim AS dim, u.v AS v
       |  FROM (
       |    SELECT a.cid,
       |      unnest(list_transform(generate_series(1, len(f.x)),
       |        i -> {'dim': i, 'v': f.x[i]})) AS u
       |    FROM a1d a JOIN fp f ON a.vec_id = f.vec_id) z),
       |cm AS (
       |  SELECT cid, dim,
       |    CAST(floor(sum(v)::DOUBLE / count(*)) AS BIGINT) AS mfp
       |  FROM ex GROUP BY 1, 2),
       |c2 AS (SELECT cid, list(mfp ORDER BY dim) AS c FROM cm GROUP BY 1),
       |a2 AS (
       |  SELECT f.vec_id,
       |    min(CAST(list_sum(list_transform(generate_series(1, len(f.x)),
       |      i -> (f.x[i] - c.c[i]) * (f.x[i] - c.c[i]))) AS BIGINT) * 16 + c.cid) AS key
       |  FROM fp f CROSS JOIN c2 c GROUP BY 1),
       |a2d AS (SELECT vec_id, key // 16 AS dist, key % 16 AS cid FROM a2),
       |l1 AS (
       |  SELECT cid,
       |    CAST(list_sum(list_transform(c, v -> abs(v))) AS BIGINT) AS c_l1
       |  FROM c2)
       |SELECT a.cid AS cluster, count(*) AS n_vecs,
       |  CAST(sum(a.dist) AS BIGINT) AS inertia, CAST(max(l.c_l1) AS BIGINT) AS c_l1
       |FROM a2d a JOIN l1 l ON a.cid = l.cid
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- URL canonicalization + per-domain dedup rollup ------------------------
  //
  // The web-crawl hygiene op every corpus build runs before content
  // dedup: canonicalize each document URL (lowercase host, strip the
  // `www.` prefix, drop `utm_*` tracking params, drop the fragment) and
  // measure per-domain URL duplication. URLs are synthesized
  // deterministically from (doc_id, source, lang) in BOTH engines — the
  // q_pii_scrub enrichment discipline — with collisions planted via the
  // `doc_id % 400` path bucket. Spark side rides the codegen'd native
  // `parse_url` expression; one narrow projection, one domain-keyed agg.

  private def qUrlCanonical(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("url", concat(
        lit("https://"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("www.")).otherwise(lit("")),
        col("source"), lit(".example.org/"), col("lang"), lit("/item/"),
        (col("doc_id") % 400).cast("string"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("?uid="), (col("doc_id") % 13).cast("string"),
            lit("&utm_source=share"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("#section-2")).otherwise(lit(""))))
      .withColumn("host", parse_url(col("url"), lit("HOST")))
      .withColumn("path", parse_url(col("url"), lit("PATH")))
      .withColumn("q", coalesce(parse_url(col("url"), lit("QUERY")), lit("")))
      .withColumn("domain", regexp_replace(col("host"), "^www\\.", ""))
      .withColumn("kept", array_join(
        filter(split(col("q"), "&"), p => !p.startsWith("utm_") && p =!= ""), "&"))
      .withColumn("canon", concat(col("domain"), col("path"),
        when(col("kept") =!= "", concat(lit("?"), col("kept"))).otherwise(lit(""))))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct("canon").as("n_canonical"),
        sum(when(col("q").contains("utm_"), 1L).otherwise(0L)).as("n_tracked"))
      .select(col("domain"), col("n_urls"), col("n_canonical"),
        (col("n_urls") - col("n_canonical")).as("n_dupes"), col("n_tracked"))
      .orderBy("domain")

  private val qUrlCanonicalSql =
    s"""WITH u AS (
       |  SELECT doc_id,
       |    'https://' ||
       |      CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
       |      source || '.example.org/' || lang || '/item/' ||
       |      CAST(doc_id % 400 AS VARCHAR) ||
       |      CASE WHEN doc_id % 2 = 0
       |        THEN '?uid=' || CAST(doc_id % 13 AS VARCHAR) || '&utm_source=share'
       |        ELSE '' END ||
       |      CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, url,
       |    regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
       |    regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path,
       |    coalesce(regexp_extract(url, '\\?([^#]*)', 1), '') AS q
       |  FROM u),
       |c AS (
       |  SELECT doc_id, q,
       |    regexp_replace(host, '^www\\.', '') AS domain,
       |    regexp_replace(host, '^www\\.', '') || path ||
       |      CASE WHEN array_to_string(list_filter(string_split(q, '&'),
       |          x -> NOT regexp_matches(x, '^utm_') AND x <> ''), '&') <> ''
       |        THEN '?' || array_to_string(list_filter(string_split(q, '&'),
       |          x -> NOT regexp_matches(x, '^utm_') AND x <> ''), '&')
       |        ELSE '' END AS canon
       |  FROM p)
       |SELECT domain, count(*) AS n_urls,
       |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
       |  count(*) - CAST(count(DISTINCT canon) AS BIGINT) AS n_dupes,
       |  CAST(sum(CASE WHEN q LIKE '%utm\\_%' ESCAPE '\\' THEN 1 ELSE 0 END) AS BIGINT) AS n_tracked
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_grouping_sets" -> (qGroupingSets _),
    "q_winnowing" -> (qWinnowing _),
    "q_kmeans" -> (qKmeans _),
    "q_url_canonical" -> (qUrlCanonical _))

  val oracles: Map[String, String] = Map(
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_winnowing" -> qWinnowingSql,
    "q_kmeans" -> qKmeansSql,
    "q_url_canonical" -> qUrlCanonicalSql)
}
