package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON FeatureCollection ingestion — the reference loads its district
  * polygons from GeoJSON files; this turns a JSON string column into one
  * row per polygon ring, typed as the `array<struct<x:double,y:double>>`
  * the graft_pip / graft_bbox_contains expressions consume.
  *
  * Pure from_json parsing (no UDF, no driver-side JSON library): the
  * geometry is parsed TWICE with fixed-depth coordinate schemas —
  * 3-level for Polygon, 4-level for MultiPolygon — and PERMISSIVE mode
  * nulls out whichever depth doesn't match each feature, so one pass
  * handles mixed collections. Scales as a plain projection: a million
  * district files or a streamed Socrata geojson export parse identically
  * per-row with no shuffle.
  */
object GeoJson {

  private def coords(depth: Int): DataType =
    (1 to depth).foldLeft(DoubleType: DataType)((t, _) => ArrayType(t))

  private def fcSchema(coordDepth: Int): StructType =
    StructType(Seq(
      StructField("type", StringType),
      StructField("features", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("properties", MapType(StringType, StringType)),
        StructField("geometry", StructType(Seq(
          StructField("type", StringType),
          StructField("coordinates", coords(coordDepth)))))))))))

  /** ring: array<array<double>> → array<struct<x,y>> (lambda-var-only
    * accesses — see DedupOps on the cost of outer refs in HOF lambdas).
    * Malformed rings (any vertex with < 2 coords) yield null — ANSI
    * element_at on a short array would otherwise kill the whole job —
    * and null rings are stripped before the polygon explode.
    */
  private def ringToPoly(ring: Column): Column =
    when(forall(ring, pt => size(pt) >= 2),
      transform(ring, pt =>
        struct(element_at(pt, 1).as("x"), element_at(pt, 2).as("y"))))
      .otherwise(lit(null))

  /** Explodes a FeatureCollection string column into
    * (feature_idx, name, poly_idx, polygon) rows: Polygon features yield
    * one row (outer ring), MultiPolygon features one row per member
    * polygon. `nameProp` selects the feature property to surface.
    */
  def features(df: DataFrame, jsonCol: Column, nameProp: String,
               keep: Seq[String] = Nil): DataFrame = {
    val parsed = df
      .withColumn("_fc3", from_json(jsonCol, fcSchema(3)))
      .withColumn("_fc4", from_json(jsonCol, fcSchema(4)))
    parsed
      .select(col("*"), posexplode(col("_fc3.features")).as(Seq("feature_idx", "_f3")))
      .withColumn("_f4", element_at(col("_fc4.features"), col("feature_idx") + 1))
      // getItem (not element_at): ANSI element_at throws on a missing map
      // key, so one feature without the property would fail the job;
      // getItem degrades to name = null
      .withColumn("name", col("_f3.properties").getItem(nameProp))
      .withColumn("_rings", filter(
        when(col("_f3.geometry.type") === "Polygon",
          // outer ring only (0-based index 0); holes are rings 1..n-1
          array(ringToPoly(get(col("_f3.geometry.coordinates"), lit(0)))))
        .when(col("_f3.geometry.type") === "MultiPolygon",
          // get (0-based, null-on-OOB) not element_at: an empty member
          // polygon must not ANSI-error the job
          transform(col("_f4.geometry.coordinates"), p => ringToPoly(get(p, lit(0)))))
        .otherwise(array().cast("array<array<struct<x:double,y:double>>>")),
        r => r.isNotNull))
      // `keep` columns ride at the END so the (feature_idx, name,
      // poly_idx, polygon) positional contract is unchanged; without a
      // passthrough, multi-document inputs were unattributable —
      // feature_idx restarts at 0 per document, so two files' rows
      // collided indistinguishably (r20 review).
      .select(Seq(col("feature_idx"), col("name"),
        posexplode(col("_rings")).as(Seq("poly_idx", "polygon"))) ++
        keep.map(col): _*)
  }

  /** File-reading convenience: whole-file GeoJSON documents → polygons,
    * each row attributed to its source file (`src_file`) so a directory
    * of district documents stays joinable per file.
    */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
           nameProp: String = "name"): DataFrame =
    features(
      spark.read.option("wholetext", true).text(path)
        .withColumn("src_file", input_file_name()),
      col("value"), nameProp, keep = Seq("src_file"))
}
