package graft.feature

import scala.collection.mutable

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.attribute.{Attribute, AttributeGroup, NumericAttribute}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared params for [[GatherEncoder]] / [[GatherEncoderModel]].
  *
  * Reference semantics: sparkext-mllib/src/main/scala/org/apache/spark/ml/
  * feature/GatherEncoder.scala:115-261 (estimator) and :268-408 (model).
  */
private[feature] trait GatherEncoderParams extends Params with HasKeyCol with HasValueCol {

  final val inputCol = new Param[String](this, "inputCol",
    "Input column: ARRAY<STRUCT<key, value>> (gathered format)")
  final val outputCol = new Param[String](this, "outputCol", "Output vector column")
  final val transformation = new Param[String](this, "transformation",
    "Dimensionality reduction: top (cumulative cover %) | index (min support %)",
    ParamValidators.inArray(Array("top", "index")))
  final val support = new DoubleParam(this, "support",
    "Minimum key frequency as % of total key count (index transformation)",
    ParamValidators.inRange(0.0, 100.0))
  final val cover = new DoubleParam(this, "cover",
    "Cumulative key-frequency coverage % (top transformation)",
    ParamValidators.inRange(0.0, 100.0))
  final val allOther = new BooleanParam(this, "allOther",
    "Add one extra slot accumulating the SUM of values of keys outside the model")
  final val keepInputCol = new BooleanParam(this, "keepInputCol",
    "Keep the input column in the output")
  final val failOnEmptyKeys = new BooleanParam(this, "failOnEmptyKeys",
    "Throw if the learned/model key set is empty")
  final val excludeKeys = new AnySetParam(this, "excludeKeys",
    "Keys excluded from the model")

  def getKeepInputCol: Boolean = $(keepInputCol)
  def getInputCol: String = $(inputCol)
  def getExcludeKeys: Set[Any] = $(excludeKeys)

  protected def validateSchema(schema: StructType): Unit = {
    val inputField = schema($(inputCol))
    inputField.dataType match {
      case ArrayType(s: StructType, _) =>
        require(s.fieldNames.contains($(keyCol)),
          s"Key field ${$(keyCol)} missing in ${inputField.name}")
        val vf = s($(valueCol))
        require(vf.dataType.isInstanceOf[NumericType],
          s"Value field must be numeric, got ${vf.dataType}")
      case other =>
        throw new IllegalArgumentException(
          s"Input column must be ARRAY<STRUCT<...>>, got $other")
    }
  }

  protected def appendVectorColumn(schema: StructType, field: StructField): StructType = {
    require(!schema.fieldNames.contains(field.name), s"Column ${field.name} already exists")
    val appended = StructType(schema.fields :+ field)
    if ($(keepInputCol)) appended
    else StructType(appended.filter(_.name != $(inputCol)))
  }
}

/** Learns the key→column-index dictionary for dummy-variable encoding of
  * gathered `ARRAY<STRUCT<key, value>>` columns, with two dimensionality
  * reductions (reference GatherEncoder.scala:151-221):
  *
  *  - '''top''': the smallest key set (by descending frequency) whose
  *    cumulative frequency stays strictly below `cover`% — computed as
  *    `scanLeft` prefix-sums + `takeWhile(_ < threshold)`, which keeps one
  *    key past the threshold (the reference's exact arithmetic, verified by
  *    the cover=95 → 8-of-9-keys fixture). `cover == 100` keeps ALL keys.
  *  - '''index''': keys with frequency ≥ `support`% of the total count
  *    (threshold computed before `excludeKeys` filtering, as in the
  *    reference).
  *
  * Divergence from the reference (documented): key order in the model is
  * deterministic here (count desc, then key string asc) — the reference's
  * `sortBy(-count)` is unstable across runs for tied counts.
  *
  * Scale: the fit runs `explode → groupBy(key).count()` distributed (partial
  * aggregation map-side, one shuffle on key), and collects only the key
  * HISTOGRAM to the driver. That is bounded by key cardinality, not data
  * size — the support/cover pruning exists precisely to keep dictionaries
  * small. For unbounded-cardinality key domains at 100 TB, prune upstream
  * or use the `index` transformation whose threshold filter runs
  * distributed before the collect.
  */
class GatherEncoder(override val uid: String)
    extends Estimator[GatherEncoderModel] with GatherEncoderParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("gatherEncoder"))

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setKeyCol(value: String): this.type = set(keyCol, value)
  def setValueCol(value: String): this.type = set(valueCol, value)
  def setTransformation(value: String): this.type = set(transformation, value)
  def setSupport(value: Double): this.type = set(support, value)
  def setCover(value: Double): this.type = set(cover, value)
  def setAllOther(value: Boolean): this.type = set(allOther, value)
  def setKeepInputCol(value: Boolean): this.type = set(keepInputCol, value)
  def setFailOnEmptyKeys(value: Boolean): this.type = set(failOnEmptyKeys, value)
  def setExcludeKeys(value: Set[Any]): this.type = set(excludeKeys, value)

  /** Hard ceiling on distinct keys collected to the driver during fit —
    * the guard that makes `top` safe on unbounded key domains (URLs, ids)
    * at 100 TB. Sorting and limiting run DISTRIBUTED (TakeOrdered, no full
    * collect); the coverage threshold still uses the EXACT distributed
    * total, so results are identical whenever the selected set fits the
    * bound, and fit fails loudly (rather than silently truncating the
    * model) when it would not.
    */
  final val maxKeys = new IntParam(this, "maxKeys",
    "Max distinct keys collected to the driver during fit (loud failure, " +
      "never silent truncation)", ParamValidators.gt(0))

  def setMaxKeys(value: Int): this.type = set(maxKeys, value)

  setDefault(transformation -> "top", support -> 0.1, cover -> 100.0,
    allOther -> false, keepInputCol -> true, failOnEmptyKeys -> true,
    excludeKeys -> Set.empty[Any], maxKeys -> 10000000)

  /** Excludes the key column can safely `isin`-compare: same type family
    * only. The API is `Set[Any]`, so a mixed-type exclude set against a
    * differently-typed key column would otherwise hit ANSI cast errors
    * ('1' vs 1) inside the scan; cross-family excludes are applied
    * driver-side over the bounded collected rows instead, where typed
    * equality just keeps the key.
    */
  private def isinCompatible(dt: DataType, v: Any): Boolean = v match {
    case null => false // handled as an isNotNull filter, not an isin entry
    case _: String => dt == StringType
    case _: Boolean => dt == BooleanType
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double |
         _: BigDecimal | _: java.math.BigDecimal | _: BigInt |
         _: java.math.BigInteger => dt.isInstanceOf[NumericType]
    case _: java.sql.Timestamp | _: java.time.Instant => dt == TimestampType
    case _: java.sql.Date | _: java.time.LocalDate => dt == DateType
    case _ => false
  }

  /** Distributed key histogram, exclude-filtered and sorted (count desc,
    * key-as-string asc) INSIDE Spark; only the top `maxKeys + 1` rows reach
    * the driver (the +1 detects overflow).
    */
  private def keyCounts(dataset: Dataset[_], needTotal: Boolean): (Array[(Any, Long)], Long) = {
    val k = s"${uid}_key"
    val keyType = dataset.schema($(inputCol)).dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]($(keyCol)).dataType
    val excluded = getExcludeKeys.toSeq
    val (sqlExcluded, localExcluded) =
      excluded.filter(_ != null).partition(isinCompatible(keyType, _))
    val counts1 = dataset
      .select(explode(col(s"${$(inputCol)}.${$(keyCol)}")).as(k))
      .groupBy(col(k)).count()
    val counts0 =
      if (excluded.contains(null)) counts1.where(col(k).isNotNull) else counts1
    // null-safe exclude: isin is NULL for a null key — keep it (a null key
    // is only dropped when null itself is excluded, above)
    val counts =
      if (sqlExcluded.isEmpty) counts0
      else counts0.where(not(coalesce(col(k).isin(sqlExcluded: _*), lit(false))))
    // the exact distributed total feeds the cover threshold — a second scan,
    // skipped on the cover=100 path which never thresholds. Driver-side
    // (cross-family) excludes stay in the total: they can only match a key
    // through typed equality on exotic types, mirroring the pre-isin
    // semantics where such keys were dropped after the collect
    val total =
      if (!needTotal) 0L
      else counts.agg(sum(col("count"))).first() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    // head-room for driver-side drops so a cross-family exclude at the
    // boundary can never starve the maxKeys+1 overflow window
    val top = counts
      .orderBy(col("count").desc, col(k).cast(StringType))
      .limit($(maxKeys) + 1 + localExcluded.size)
      .collect()
      .map(r => (r.get(0), r.getLong(1)))
    val filtered =
      if (localExcluded.isEmpty) top
      else top.filterNot { case (key, _) => localExcluded.exists(_ == key) }
        .take($(maxKeys) + 1)
    (filtered, total)
  }

  private def computeTopKeys(dataset: Dataset[_]): Array[Any] = {
    val (topKeys, total) = keyCounts(dataset, needTotal = $(cover) != 100.0)
    def requireBounded(needed: => Boolean): Unit = require(needed,
      s"GatherEncoder fit needs more than maxKeys=${$(maxKeys)} distinct keys; " +
        "raise maxKeys, lower cover, or use the index transformation")
    if ($(cover) == 100.0) {
      requireBounded(topKeys.length <= $(maxKeys))
      topKeys.map(_._1)
    } else {
      val threshold = ($(cover) / 100) * total
      val below = topKeys.map(_._2).scanLeft(0L)(_ + _).takeWhile(_ < threshold).length
      requireBounded(below <= $(maxKeys))
      topKeys.take(below).map(_._1)
    }
  }

  /** Unlike `top`, the support filter runs DISTRIBUTED (HAVING count >=
    * threshold before the collect), so the driver sees only qualifying
    * keys — safe for unbounded-cardinality key domains. Two jobs: a global
    * count for the threshold, then the filtered histogram.
    */
  private def computeIndexKeys(dataset: Dataset[_]): Array[Any] = {
    val k = s"${uid}_key"
    val exploded = dataset.select(explode(col(s"${$(inputCol)}.${$(keyCol)}")).as(k))
    val threshold = ($(support) / 100) * exploded.count()
    exploded.groupBy(col(k)).count()
      .where(col("count") >= threshold)
      .collect()
      .map(r => (r.get(0), r.getLong(1)))
      .filter { case (key, _) => !getExcludeKeys.contains(key) }
      .sortBy { case (key, cnt) => (-cnt, String.valueOf(key)) }
      .map(_._1)
  }

  override def fit(dataset: Dataset[_]): GatherEncoderModel = {
    validateSchema(dataset.schema)
    val gatherKeys = $(transformation) match {
      case "top"   => computeTopKeys(dataset)
      case "index" => computeIndexKeys(dataset)
    }
    copyValues(new GatherEncoderModel(uid, gatherKeys).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType = {
    validateSchema(schema)
    appendVectorColumn(schema, new AttributeGroup($(outputCol)).toStructField())
  }

  override def copy(extra: ParamMap): GatherEncoder = defaultCopy(extra)
}

/** Encodes each row's gathered key/value array into a sparse vector of size
  * `modelKeys.length` (+1 when `allOther`).
  *
  * Reference edge semantics preserved exactly (GatherEncoder.scala:326-370):
  *  - duplicate key in one row → LATEST value wins (not summed)
  *  - unseen key → value SUMMED into the all-other slot, or dropped
  *  - null input array → empty sparse vector
  *  - empty model keys → error when `failOnEmptyKeys`, else degenerate
  *    empty dense vector
  *  - output column carries an AttributeGroup of NumericAttributes labeled
  *    with key strings (+ "all other")
  *
  * The encode is a row-local UDF — no shuffle, scales linearly.
  */
class GatherEncoderModel(override val uid: String)
    extends Model[GatherEncoderModel] with GatherEncoderParams
    with MLWritable {

  def this(uid: String, keys: Array[Any]) = { this(uid); set(modelKeysParam, keys) }
  def this(keys: Array[Any]) = this(Identifiable.randomUID("gatherEncoder"), keys)

  /** Learned dictionary as a param so `save`/`load` round-trips it with the
    * typed codec; order IS the feature index order.
    */
  final val modelKeysParam: AnyArrayParam = new AnyArrayParam(this, "modelKeys",
    "Ordered key dictionary learned by GatherEncoder")

  def modelKeys: Array[Any] = $(modelKeysParam)

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setKeyCol(value: String): this.type = set(keyCol, value)
  def setValueCol(value: String): this.type = set(valueCol, value)
  def setAllOther(value: Boolean): this.type = set(allOther, value)
  def setKeepInputCol(value: Boolean): this.type = set(keepInputCol, value)
  def setFailOnEmptyKeys(value: Boolean): this.type = set(failOnEmptyKeys, value)

  setDefault(cover -> 100.0, support -> 0.1, transformation -> "top",
    allOther -> true, keepInputCol -> true, failOnEmptyKeys -> true,
    excludeKeys -> Set.empty[Any])

  private def labels: Array[String] = modelKeys.map(String.valueOf)
  @transient private lazy val keyIndex: Map[Any, Int] = modelKeys.zipWithIndex.toMap

  override def transform(dataset: Dataset[_]): DataFrame = {
    if (modelKeys.isEmpty && $(failOnEmptyKeys)) {
      throw new IllegalArgumentException(
        s"Can't encode gathered data with empty model keys. " +
          s"Check that input column '$getInputCol' has data.")
    }
    val outputSchema = transformSchema(dataset.schema)

    val allOtherEnabled = $(allOther)
    val numModelKeys = modelKeys.length
    val featureSize = if (allOtherEnabled) numModelKeys + 1 else numModelKeys
    val index = keyIndex

    val encoder = udf { (arr: Seq[Row]) =>
      if (featureSize == 0) {
        Vectors.dense(Array.empty[Double])
      } else if (arr == null) {
        Vectors.sparse(featureSize, Nil)
      } else {
        val elements = mutable.Map.empty[Int, Double]
        arr.foreach { kv =>
          if (kv != null) {
            val key = kv.get(0)
            val value = if (kv.isNullAt(1)) 0.0 else kv.getDouble(1)
            index.get(key) match {
              case Some(i) => elements(i) = value // latest value wins
              case None if allOtherEnabled =>
                elements(numModelKeys) = elements.getOrElse(numModelKeys, 0.0) + value
              case None => // dropped
            }
          }
        }
        Vectors.sparse(featureSize, elements.toSeq.sortBy(_._1))
      }
    }

    val metadata = outputSchema($(outputCol)).metadata
    val kvStructs = transform_values_expr(dataset)
    val encodedCol = encoder(kvStructs).as($(outputCol), metadata)

    if ($(keepInputCol)) {
      dataset.select(col("*"), encodedCol)
    } else {
      val cols = dataset.schema.fieldNames.filter(_ != $(inputCol)).map(col)
      dataset.select(cols.toSeq :+ encodedCol: _*)
    }
  }

  /** Normalize the input array to ARRAY<STRUCT<k: original, v: DOUBLE>> so
    * the UDF sees a fixed shape regardless of extra struct fields.
    */
  private def transform_values_expr(dataset: Dataset[_]) =
    org.apache.spark.sql.functions.transform(col($(inputCol)),
      x => struct(x.getField($(keyCol)).as("k"),
        x.getField($(valueCol)).cast(DoubleType).as("v")))

  override def transformSchema(schema: StructType): StructType = {
    validateSchema(schema)
    val attrLabels = if ($(allOther)) labels :+ "all other" else labels
    val attrs: Array[Attribute] = attrLabels.map(l => NumericAttribute.defaultAttr.withName(l))
    val attrGroup = new AttributeGroup($(outputCol), attrs)
    appendVectorColumn(schema, attrGroup.toStructField())
  }

  override def copy(extra: ParamMap): GatherEncoderModel = {
    val copied = new GatherEncoderModel(uid)
    copyValues(copied, extra).setParent(parent)
  }

  override def write: MLWriter = new GatherEncoderModel.Writer(this)
}

object GatherEncoder extends DefaultParamsReadable[GatherEncoder]

/** Model persistence follows the MLlib big-state convention: the learned
  * dictionary (up to `maxKeys` = 10M entries) is a PARQUET DATA FILE at
  * `<path>/keys`, not a param — a param would funnel the whole dictionary
  * through one driver-written JSON string in the metadata file. Metadata
  * keeps only the scalar params (typed-JSON-encoded per param).
  */
object GatherEncoderModel extends MLReadable[GatherEncoderModel] {
  import org.json4s._
  import org.json4s.jackson.JsonMethods.{compact, parse, render}

  private class Writer(instance: GatherEncoderModel) extends MLWriter {
    // the standard DefaultParamsWriter envelope (class/timestamp/
    // sparkVersion/uid/paramMap/defaultParamMap) minus modelKeys — Pipeline
    // persistence parses stage metadata with DefaultParamsReader, so the
    // shape must match even though our own Reader does the loading
    override protected def saveImpl(path: String): Unit = {
      val spark = sparkSession
      import spark.implicits._
      def paramsJson(setOnly: Boolean): JObject = JObject(
        instance.params.toSeq
          .filter(p => p.name != instance.modelKeysParam.name &&
            (if (setOnly) instance.isSet(p) else instance.hasDefault(p)))
          .sortBy(_.name)
          .map { p0 =>
            val p = p0.asInstanceOf[org.apache.spark.ml.param.Param[Any]]
            val v = if (setOnly) instance.getOrDefault(p)
              else instance.getDefault(p).get
            p.name -> parse(p.jsonEncode(v))
          }: _*)
      val meta = compact(render(JObject(
        "class" -> JString(instance.getClass.getName),
        "timestamp" -> JLong(System.currentTimeMillis()),
        "sparkVersion" -> JString(spark.sparkContext.version),
        "uid" -> JString(instance.uid),
        "paramMap" -> paramsJson(setOnly = true),
        "defaultParamMap" -> paramsJson(setOnly = false))))
      spark.createDataset(Seq(meta)).repartition(1).write.mode("overwrite")
        .text(s"$path/metadata")
      instance.modelKeys.zipWithIndex.toSeq
        .map { case (k, i) => (i, compact(render(AnyJson.encode(k)))) }
        .toDF("idx", "kjson")
        .write.mode("overwrite").parquet(s"$path/keys")
    }
  }

  private class Reader extends MLReader[GatherEncoderModel] {
    override def load(path: String): GatherEncoderModel = {
      val spark = sparkSession
      val meta = parse(spark.read.text(s"$path/metadata").head().getString(0))
      val fields = meta.asInstanceOf[JObject].obj.toMap
      val uid = fields("uid").asInstanceOf[JString].s
      val keys = spark.read.parquet(s"$path/keys")
        .orderBy("idx").select("kjson").collect()
        .map(r => AnyJson.decode(parse(r.getString(0))))
      val model = new GatherEncoderModel(uid, keys)
      // restore the persisted DEFAULTS before the explicit params: fit's
      // copyValues propagates the ESTIMATOR's defaults (allOther=false)
      // into the model's defaultParamMap, overriding the model class's
      // own setDefault(allOther=true). Skipping this restore made
      // save/load silently flip allOther back to true — the loaded model
      // emitted vectors one slot WIDER than the in-session model it was
      // saved from (dimension mismatch for any downstream consumer).
      fields("defaultParamMap").asInstanceOf[JObject].obj.foreach { case (name, j) =>
        val p = model.getParam(name).asInstanceOf[org.apache.spark.ml.param.Param[Any]]
        model.setDefault(p, p.jsonDecode(compact(render(j))))
      }
      fields("paramMap").asInstanceOf[JObject].obj.foreach { case (name, j) =>
        val p = model.getParam(name).asInstanceOf[org.apache.spark.ml.param.Param[Any]]
        model.set(p, p.jsonDecode(compact(render(j))))
      }
      model
    }
  }

  override def read: MLReader[GatherEncoderModel] = new Reader
  override def load(path: String): GatherEncoderModel = super.load(path)
}
