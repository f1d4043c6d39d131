package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.fixtures.RefFixtures._

/** Scalar-function surface of the reference (SURVEY.md §2.8, ops 30a-30l):
  * path manipulation, tolerant `du`-line parsing, ACL-entry split, JSON
  * round-trip, map ops, timestamp formatting. All codegen'd builtins —
  * no UDFs anywhere in the hot path.
  */
object ScalarOps {

  val queries: Seq[GraftQuery] = Seq(

    // ops 30a/30d/30e/30l: dirname/basename/stem/ext/url/metadata-key strings
    GraftQuery("scalar_path_suite",
      s"""WITH $InvCte
         |SELECT name,
         |       regexp_extract(name, '[^/]*$$') AS basename,
         |       regexp_replace(regexp_extract(name, '[^/]*$$'), '\\.[^.]*$$', '') AS stem,
         |       regexp_extract(name, '\\.([^./]*)$$', 1) AS ext,
         |       concat('https://acct.dfs.core.windows.net/fs', name) AS url,
         |       concat('x-ms-meta-', owner) AS meta_key,
         |       upper(name) AS name_upper,
         |       lpad(CAST(length AS VARCHAR), 12, '0') AS len_pad
         |FROM inv ORDER BY name""".stripMargin) { (spark, sfDir) =>
      inventory(spark, sfDir).select(
        col("name"),
        regexp_extract(col("name"), "[^/]*$", 0).as("basename"),
        regexp_replace(regexp_extract(col("name"), "[^/]*$", 0), "\\.[^.]*$", "").as("stem"),
        regexp_extract(col("name"), "\\.([^./]*)$", 1).as("ext"),
        concat(lit("https://acct.dfs.core.windows.net/fs"), col("name")).as("url"),
        concat(lit("x-ms-meta-"), col("owner")).as("meta_key"),
        upper(col("name")).as("name_upper"),
        lpad(col("length").cast("string"), 12, "0").as("len_pad"))
        .orderBy("name")
    },

    // op 1 parse + 30b/30f: tolerant 2-/3-column `du` line parsing
    // (generate-file-list.py:7-17)
    GraftQuery("scalar_du_parse",
      s"""WITH $InvFilesCte,
         |lines AS (SELECT name,
         |    concat(length, '  ', length * 3, '  ', name) AS l3,
         |    concat(length, '  ', name) AS l2 FROM invf),
         |p AS (SELECT name,
         |    CAST(regexp_extract(l3, '^([0-9]+)', 1) AS BIGINT) AS size3,
         |    regexp_extract(l3, '([^ ]+)$$', 1) AS path3,
         |    CAST(regexp_extract(l2, '^([0-9]+)', 1) AS BIGINT) AS size2,
         |    regexp_extract(l2, '([^ ]+)$$', 1) AS path2 FROM lines)
         |SELECT name, size3, path3, (size3 = size2 AND path3 = path2) AS consistent
         |FROM p ORDER BY name""".stripMargin) { (spark, sfDir) =>
      val lines = invFiles(spark, sfDir).select(
        col("name"),
        concat(col("length"), lit("  "), col("length") * 3, lit("  "), col("name")).as("l3"),
        concat(col("length"), lit("  "), col("name")).as("l2"))
      lines.select(
        col("name"),
        regexp_extract(col("l3"), "^([0-9]+)", 1).cast("long").as("size3"),
        regexp_extract(col("l3"), "([^ ]+)$", 1).as("path3"),
        regexp_extract(col("l2"), "^([0-9]+)", 1).cast("long").as("size2"),
        regexp_extract(col("l2"), "([^ ]+)$", 1).as("path2"))
        .select(col("name"), col("size3"), col("path3"),
          (col("size3") === col("size2") && col("path3") === col("path2")).as("consistent"))
        .orderBy("name")
    },

    // op 30c: ACL entry split with 3-/4-field positional logic
    GraftQuery("scalar_acl_split",
      s"""WITH $AclCte,
         |ex AS (SELECT file, unnest(acl) AS entry FROM aclrec),
         |p AS (SELECT file, entry, string_split(entry, ':') AS parts,
         |             len(string_split(entry, ':')) AS nf FROM ex)
         |SELECT file, entry, nf,
         |       CASE WHEN nf = 4 THEN parts[2] ELSE parts[1] END AS atype,
         |       CASE WHEN nf = 4 THEN parts[3] ELSE parts[2] END AS aid,
         |       parts[-1] AS aperms
         |FROM p ORDER BY file, entry""".stripMargin) { (spark, sfDir) =>
      aclRecords(spark, sfDir)
        .select(col("file"), explode(col("acl")).as("entry"))
        .withColumn("parts", split(col("entry"), ":", -1))
        .withColumn("nf", size(col("parts")))
        .select(col("file"), col("entry"), col("nf"),
          when(col("nf") === 4, element_at(col("parts"), 2))
            .otherwise(element_at(col("parts"), 1)).as("atype"),
          when(col("nf") === 4, element_at(col("parts"), 3))
            .otherwise(element_at(col("parts"), 2)).as("aid"),
          element_at(col("parts"), -1).as("aperms"))
        .orderBy("file", "entry")
    },

    // op 30h: JSON decode of the hdi_permission convention
    // (adls_copy_utils.py:80)
    GraftQuery("scalar_json",
      s"""WITH $InvCte,
         |j AS (SELECT name,
         |  concat('{"owner":"', owner, '","group":"', grp, '","permissions":"', perms, '"}') AS js
         |  FROM inv)
         |SELECT name, json_extract_string(js, '$$.owner') AS j_owner,
         |       json_extract_string(js, '$$.group') AS j_group,
         |       json_extract_string(js, '$$.permissions') AS j_perms
         |FROM j ORDER BY name""".stripMargin) { (spark, sfDir) =>
      val permSchema = StructType(Seq(
        StructField("owner", StringType), StructField("group", StringType),
        StructField("permissions", StringType)))
      inventory(spark, sfDir)
        .withColumn("js", concat(lit("{\"owner\":\""), col("owner"),
          lit("\",\"group\":\""), col("grp"),
          lit("\",\"permissions\":\""), col("perms"), lit("\"}")))
        .withColumn("parsed", from_json(col("js"), permSchema))
        .select(col("name"),
          col("parsed.owner").as("j_owner"),
          col("parsed.group").as("j_group"),
          col("parsed.permissions").as("j_perms"))
        .orderBy("name")
    },

    // op 30i: metadata map ops — reserved-key subtraction + x-ms-meta-
    // prefixing (adls_copy_utils.py:82-83, identity-mapper.py:24-28).
    // Oracle is by-construction constants (DuckDB lacks map_filter).
    GraftQuery("scalar_map_ops",
      s"""WITH $InvCte
         |SELECT name, 'src' AS kept_keys, 1 AS n_kept,
         |       'x-ms-meta-src' AS prefixed_keys
         |FROM inv ORDER BY name""".stripMargin) { (spark, sfDir) =>
      val reserved = Seq("hdi_isfolder", "hdi_permission")
      inventory(spark, sfDir)
        .withColumn("metadata", map(
          lit("src"), lit("hdfs"),
          lit("hdi_isfolder"), when(col("is_folder"), lit("true")).otherwise(lit("false")),
          lit("hdi_permission"), col("perms")))
        .withColumn("kept", map_filter(col("metadata"),
          (k, _) => !k.isin(reserved: _*)))
        .select(col("name"),
          array_join(array_sort(map_keys(col("kept"))), ",").as("kept_keys"),
          size(map_keys(col("kept"))).as("n_kept"),
          array_join(array_sort(map_keys(
            transform_keys(col("kept"), (k, _) => concat(lit("x-ms-meta-"), k)))), ",")
            .as("prefixed_keys"))
        .orderBy("name")
    },

    // op 30j: RFC-1123-ish formatting + SAS expiry arithmetic
    // (adls_copy_utils.py:62, identity-mapper.py:26)
    GraftQuery("scalar_timestamp",
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%a, %d %b %Y %H:%M:%S') || ' GMT' AS rfc1123,
        |       CAST(o_orderdate + INTERVAL 2 DAY AS DATE) AS sas_expiry
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
      graft.Tables.orders(spark, sfDir).select(
        col("o_orderkey"),
        concat(date_format(col("o_orderdate"), "EEE, dd MMM yyyy HH:mm:ss"),
          lit(" GMT")).as("rfc1123"),
        (col("o_orderdate") + expr("INTERVAL 2 DAYS")).cast("date").as("sas_expiry"))
        .orderBy("o_orderkey")
    }
  )
}
