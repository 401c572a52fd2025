package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorFunctions
import graft.model._
import graft.text.Tokenize

/**
 * Compiles a `Where` clause tree into Catalyst predicates.
 *
 * The reference resolves each leaf to a roaring doc-ID bitmap and combines with
 * AND/OR/NOT (adapters/repos/db/inverted/searcher.go:163-200,
 * prop_value_pairs.go:60-130). Here each leaf becomes a `Column` predicate, so
 * Catalyst pushes comparisons into the parquet scan (PushedFilters) and the
 * boolean combinators are free — this is the idiomatic-Spark translation of
 * the bitmap algebra, and it scales: predicate pushdown + column pruning work
 * at any data size without materializing ID sets.
 *
 * Cross-reference path clauses (path = [refProp, TargetClass, ...tail]) cannot
 * be a pure Column — they compile to a semi-join against the target collection
 * (reference: searcher_ref_filter.go). `compile` therefore rewrites each ref
 * leaf into a boolean column derived from a (broadcast when small) left join,
 * then the rest of the tree composes as plain predicates, preserving arbitrary
 * nesting (Not over ref clauses included).
 */
final class FilterCompiler(resolve: String => Collection) {

  /** Apply `where` to the collection's DataFrame, returning the filtered frame. */
  def apply(df: DataFrame, schema: CollectionSchema, where: Where): DataFrame = {
    validate(schema, where)
    val (prepared, col) = compile(df, schema, where, 0)
    prepared.filter(col).drop(prepared.columns.filter(_.startsWith("__ref_match_")): _*)
  }

  // --- validation (reference: entities/filters/filters_validator.go) --------

  private val comparisonOps: Set[WhereOp] = Set(WhereOp.Equal, WhereOp.NotEqual,
    WhereOp.GreaterThan, WhereOp.GreaterThanEqual, WhereOp.LessThan, WhereOp.LessThanEqual)

  private def valueName(v: FilterValue): String = v match {
    case FilterValue.IntV(_)            => "valueInt"
    case FilterValue.NumberV(_)         => "valueNumber"
    case FilterValue.TextV(_)           => "valueText"
    case FilterValue.BoolV(_)           => "valueBoolean"
    case FilterValue.DateV(_)           => "valueDate"
    case FilterValue.GeoRangeV(_, _, _) => "valueGeoRange"
    case FilterValue.ListV(vs)          => vs.headOption.map(valueName).getOrElse("empty list")
  }

  private def expectedName(t: PropType): String = t match {
    case PropType.Text | PropType.Uuid => "valueText"
    case PropType.Int                  => "valueInt"
    case PropType.Number               => "valueNumber"
    case PropType.Bool                 => "valueBoolean"
    case PropType.Date                 => "valueDate"
    case PropType.Geo                  => "valueGeoRange"
    case PropType.Arr(b)               => expectedName(b)
    case other                         => other.name
  }

  private def valueMatches(t: PropType, v: FilterValue): Boolean = (t, v) match {
    case (PropType.Arr(b), _)                             => valueMatches(b, v)
    case (_, FilterValue.ListV(vs))                       => vs.nonEmpty && vs.forall(valueMatches(t, _))
    case (PropType.Text | PropType.Uuid, FilterValue.TextV(_)) => true
    case (PropType.Int, FilterValue.IntV(_))              => true
    case (PropType.Number, FilterValue.NumberV(_))        => true
    case (PropType.Bool, FilterValue.BoolV(_))            => true
    case (PropType.Date, FilterValue.DateV(_))            => true
    case _                                                => false
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /**
   * Type-vs-operator validation matrix (reference: entities/filters/
   * filters_validator.go) — friendly, weaviate-shaped errors instead of
   * downstream Spark analysis failures. Divergences from the reference,
   * both forced by ids being schema-typed here instead of uuid-text:
   * `_id` accepts valueInt as well as valueText; the timestamp pseudo-props
   * accept valueInt (epoch) as well as valueDate/valueText.
   */
  private[graft] def validate(schema: CollectionSchema, w: Where): Unit = w.op match {
    case WhereOp.And | WhereOp.Or =>
      if (w.operands.isEmpty) fail(s"empty ${w.op.name}: at least one operand required")
      w.operands.foreach(validate(schema, _))
    case WhereOp.Not =>
      if (w.operands.size != 1) fail("Not takes exactly one operand")
      validate(schema, w.operands.head)
    case op => validateLeaf(schema, w, op)
  }

  private val LenPathRe = "len\\((.+)\\)".r

  private def validateLeaf(schema: CollectionSchema, w: Where, op: WhereOp): Unit = {
    val v = w.value.getOrElse(fail(s"operator ${op.name} on ${w.path.mkString("/")}: value required"))
    if (w.path.isEmpty) fail(s"operator ${op.name}: property path required")

    // IsNull composes with ANY property type but requires a boolean value
    // (filters_validator.go:119-124) and the class-level null-state index
    // (prop_value_pairs.go:383 — exact reference message, default OFF)
    if (op == WhereOp.IsNull) {
      if (!v.isInstanceOf[FilterValue.BoolV])
        fail(s"operator IsNull requires a booleanValue, got ${valueName(v)} instead")
      if (!schema.invertedIndex.indexNullState)
        fail("Nullstate must be indexed to be filterable! Add `indexNullState: true` to the invertedIndexConfig")
      return
    }

    w.path.head match {
      // property-length filter (filters_validator.go:127-143)
      case LenPathRe(inner) =>
        val iv = v match {
          case FilterValue.IntV(x) => x
          case other => fail(s"Filtering for property length requires valueInt, got ${valueName(other)} instead")
        }
        if (!comparisonOps.contains(op))
          fail("Filtering for property length supports operators (not) equal and " +
            s"greater/less than (equal), got ${op.name} instead")
        if (iv < 0) fail(s"Can only filter for positive property length got $iv instead")
        if (schema.property(inner).isEmpty && inner != schema.idColumn)
          fail(s"no such prop with name '$inner' found in class '${schema.name}'")
        schema.property(inner) match {
          // len() on a cref is the ref META COUNT — gated on the prop's own
          // inverted index, not the class length config (searcher.go:702,
          // errors.go missingFilterableMetaCountFormat)
          case Some(p) if p.dataType == PropType.Ref ||
              p.dataType == PropType.Arr(PropType.Ref) =>
            if (!p.hasAnyInvertedIndex)
              fail(s"Searching by property '$inner' count requires inverted index. " +
                s"Is `indexFilterable` option of property '$inner' enabled? " +
                "Set it to `true` or leave empty")
          // primitive length — class-level IndexPropertyLength gate
          // (prop_value_pairs.go:379 — exact reference message, default OFF)
          case _ =>
            if (!schema.invertedIndex.indexPropertyLength)
              fail("Property length must be indexed to be filterable! " +
                "add `IndexPropertyLength: true` to the invertedIndexConfig " +
                s"in ${schema.name}.  Geo-coordinates, phone numbers and data " +
                "blobs are not supported by property length.")
        }
        return
      // metadata pseudo-props (filters_validator.go:210-228); "id" is the
      // backwards-compat alias (filters/consts.go:17
      // InternalPropBackwardsCompatID) honored whenever the class has no
      // property of its own named "id"
      case p0 @ ("_id" | "id") if p0 == "_id" || schema.property("id").isEmpty =>
        // the reference validator constrains only the VALUE type on the id
        // pseudo-prop (filters_validator.go:209-216) — ContainsAny with an
        // id list (the filter-by-ids idiom) is as valid as a comparison,
        // and Like with a text pattern is how the reference's own matrix
        // tests select all/one objects by uuid
        val containsOps: Set[WhereOp] =
          Set(WhereOp.ContainsAny, WhereOp.ContainsAll, WhereOp.ContainsNone)
        if (!comparisonOps.contains(op) && !containsOps.contains(op) && op != WhereOp.Like)
          fail(s"""using ["_id"]: operator ${op.name} is not supported on the id property""")
        v match {
          case FilterValue.TextV(_) | FilterValue.IntV(_) => ()
          case FilterValue.ListV(vs) if containsOps.contains(op) && vs.nonEmpty &&
            vs.forall(x => x.isInstanceOf[FilterValue.TextV] || x.isInstanceOf[FilterValue.IntV]) => ()
          case other => fail(s"""using ["_id"] to filter by id: must use valueText or valueInt, got ${valueName(other)}""")
        }
        return
      case p @ ("_creationTimeUnix" | "_lastUpdateTimeUnix") =>
        if (!comparisonOps.contains(op))
          fail(s"""using ["$p"]: operator ${op.name} is not supported on timestamps""")
        v match {
          case FilterValue.DateV(_) | FilterValue.TextV(_) | FilterValue.IntV(_) => ()
          case other => fail(s"""using ["$p"] to filter by timestamp: must use valueDate, valueText or valueInt, got ${valueName(other)}""")
        }
        // class-level IndexTimestamps gate (prop_value_pairs.go:389 — exact
        // reference message, default OFF)
        if (!schema.invertedIndex.indexTimestamps)
          fail("Timestamps must be indexed to be filterable! Add " +
            s"`IndexTimestamps: true` to the InvertedIndexConfig in ${schema.name}")
        return
      // the raw id column addressed by name gets the same leniency as "_id":
      // ids are schema-typed here (not uuid-text), so valueInt is as valid as
      // valueText for them
      case p if p == schema.idColumn && schema.property(p).isEmpty =>
        if (!comparisonOps.contains(op))
          fail(s"operator ${op.name} is not supported on the id property '$p'")
        v match {
          case FilterValue.TextV(_) | FilterValue.IntV(_) => ()
          case other => fail(s"filtering by id: must use valueText or valueInt, got ${valueName(other)}")
        }
        return
      case _ => ()
    }

    val prop = schema.property(w.path.head).getOrElse(
      fail(s"no such prop with name '${w.path.head}' found in class '${schema.name}'"))

    prop.dataType match {
      // cross-reference descent: validate the tail against the target class
      // (validateClause recursion over the ref path)
      case PropType.Ref if w.path.length >= 2 =>
        val target = resolve(refPathTarget(prop, w))
        validate(target.schema, w.copy(path = w.path.drop(2)))
      // directly on a ref prop only valueInt counts edges (filters_validator.go:150-161);
      // the count serves from the prop's meta-count bucket → inverted-index gate
      // (searcher.go:702, missingFilterableMetaCountFormat)
      case PropType.Ref if !prop.hasAnyInvertedIndex =>
        fail(s"Searching by property '${w.path.head}' count requires inverted index. " +
          s"Is `indexFilterable` option of property '${w.path.head}' enabled? " +
          "Set it to `true` or leave empty")
      case PropType.Ref =>
        // a BARE valueInt only — a ListV (Contains*) would pass here but the
        // compiler's ref-count arm requires IntV, so the leaf would fall
        // through to array<id> === int and die at execution with an
        // AnalysisException instead of this reference-shaped error
        if (!v.isInstanceOf[FilterValue.IntV])
          fail(s"""Property "${w.path.head}" is a ref prop to the class "${prop.refTarget.getOrElse("?")}". Only "valueInt" can be used on a ref prop directly to count the number of refs. Or did you mean to filter on a primitive prop of the referenced class? In this case make sure your path contains 3 elements in the form of [<propName>, <ClassNameOfReferencedClass>, <primitivePropOnClass>]""")
      // nested object[] descent: sub-schemas are untyped here (PropType.Obj
      // carries no fields), so element-level value typing is checked at
      // execution; the structural rules still apply
      case PropType.Arr(PropType.Obj) if w.path.length >= 2 => ()
      case PropType.Obj if w.path.length >= 2 => ()
      // geo: WithinGeoRange with a non-negative radius, and nothing else
      // (the reference validates the GeoRange shape in filters.go)
      case PropType.Geo =>
        if (op != WhereOp.WithinGeoRange)
          fail(s"operator ${op.name} is not supported on geoCoordinates property '${w.path.head}' — use WithinGeoRange (or IsNull)")
        v match {
          case FilterValue.GeoRangeV(_, _, d) =>
            if (d < 0) fail(s"max distance must be non-negative, got $d")
          case other => fail(s"WithinGeoRange requires valueGeoRange, got ${valueName(other)} instead")
        }
      case PropType.Phone | PropType.Obj => () // struct gate lives in leaf()
      case t =>
        // a property with NO inverted index (filterable off, and no
        // searchable/rangeable fallback) cannot be filtered on — exact
        // reference error (searcher.go:919, missingFilterableFormat)
        if (!prop.hasAnyInvertedIndex)
          fail(s"Filtering by property '${w.path.head}' requires inverted index. " +
            s"Is `indexFilterable` option of property '${w.path.head}' enabled? " +
            "Set it to `true` or leave empty")
        if (op == WhereOp.WithinGeoRange)
          fail(s"operator WithinGeoRange requires a geoCoordinates property, '${w.path.head}' is ${t.name}")
        else if (op == WhereOp.Like) {
          if (t != PropType.Text && t != PropType.Uuid && t != PropType.Arr(PropType.Text))
            fail(s"operator Like is only supported on text properties, '${w.path.head}' is ${t.name}")
          if (!v.isInstanceOf[FilterValue.TextV])
            fail(s"operator Like requires valueText, got ${valueName(v)} instead")
        } else if (!valueMatches(t, v))
          fail(s"""data type filter cannot use "${valueName(v)}" on type "${t.name}", use "${expectedName(t)}" instead""")
    }
  }

  /** Compile to (possibly ref-join-augmented DataFrame, predicate Column). */
  private def compile(df: DataFrame, schema: CollectionSchema, w: Where, depth: Int): (DataFrame, Column) =
    w.op match {
      case WhereOp.And =>
        // Correlated nested-array semantics (reference: searcher_nested.go,
        // prop_value_pairs_nested_recursive.go): sibling AND-predicates that
        // descend into the SAME object[] property must match on the SAME array
        // element, so they compile into ONE exists(arr, x -> p1 && p2 && ...).
        val (nested, plain) = w.operands.partition(isNestedArrayLeaf(schema, _))
        val correlated: Seq[Column] = nested.groupBy(_.path.head).toSeq.sortBy(_._1)
          .map { case (head, ws) =>
            exists(col(head), x => ws.map(elementPred(x, _)).reduce(_ && _))
          }
        val (d, c) = plain.foldLeft((df, lit(true))) { case ((d0, c0), o) =>
          val (d2, c2) = compile(d0, schema, o, depth); (d2, c0 && c2)
        }
        (d, correlated.foldLeft(c)(_ && _))
      case WhereOp.Or =>
        w.operands.foldLeft((df, lit(false))) { case ((d, c), o) =>
          val (d2, c2) = compile(d, schema, o, depth); (d2, c || c2)
        }
      case WhereOp.Not =>
        val (d2, c2) = compile(df, schema, w.operands.head, depth)
        (d2, !c2)
      case _ if isRefPath(schema, w.path) =>
        compileRefLeaf(df, schema, w, depth)
      case _ if isNestedArrayLeaf(schema, w) =>
        // standalone nested leaf (or inside Or/Not): element-existential
        (df, exists(col(w.path.head), x => elementPred(x, w)))
      case _ if isLenRefLeaf(schema, w) =>
        (df, lenRefPred(df, w))
      case _ if isRefCountLeaf(df, schema, w) =>
        (df, refCountPred(w))
      case _ =>
        (df, leaf(schema, w))
    }

  /** `len(ref)` — the LAYOUT-INDEPENDENT edge-count filter: explicit count
   * semantics whether the cref is stored as a beacon array or a scalar FK
   * (the int-on-ref heuristic below is array-only by design; this pseudo-path
   * is the documented alternative for scalar layouts). */
  private val LenOfRe = "len\\((.+)\\)".r
  private def isLenRefLeaf(schema: CollectionSchema, w: Where): Boolean =
    w.path.length == 1 && (w.path.head match {
      case LenOfRe(p) => schema.property(p).exists(_.dataType == PropType.Ref)
      case _          => false
    })
  private def lenRefPred(df: DataFrame, w: Where): Column = {
    val LenOfRe(p) = w.path.head: @unchecked
    val count = df.schema(p).dataType match {
      case _: org.apache.spark.sql.types.ArrayType => coalesce(size(col(p)), lit(0))
      case _ => when(col(p).isNull, lit(0)).otherwise(lit(1))
    }
    cmp(w.op, count.cast("long"), w.value.get, None, Set.empty)
  }

  /** valueInt directly on a MULTI-EDGE (array-column) ref prop = filter on the
   * number of outgoing edges (reference: inverted/searcher.go:694,
   * extractReferenceCount — count semantics are specific to beacon lists).
   * Scalar-FK ref columns keep plain value semantics: the reference's refs are
   * beacons (never int-comparable), so an Int `Equal` on a scalar FK must mean
   * "FK equals this id", not "edge count equals" — guarded by requiring the
   * backing column to be ArrayType. */
  private def isRefCountLeaf(df: DataFrame, schema: CollectionSchema, w: Where): Boolean =
    w.path.length == 1 && w.value.exists(_.isInstanceOf[FilterValue.IntV]) &&
      schema.property(w.path.head).exists(_.dataType == PropType.Ref) &&
      df.schema(w.path.head).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]

  /** Edge count of a beacon list; null list = 0 edges (reference complement). */
  private def refCountPred(w: Where): Column =
    cmp(w.op, coalesce(size(col(w.path.head)), lit(0)).cast("long"), w.value.get, None, Set.empty)

  /** Leaf whose path descends into an `object[]` property (nested-array filter,
   * reference: inverted/searcher_nested.go). */
  private def isNestedArrayLeaf(schema: CollectionSchema, w: Where): Boolean =
    w.operands.isEmpty && w.path.length >= 2 &&
      schema.property(w.path.head).exists(_.dataType == PropType.Arr(PropType.Obj))

  /** The leaf predicate applied to one array element (the lambda variable). */
  private def elementPred(elem: Column, w: Where): Column = {
    val c = w.path.tail.foldLeft(elem)(_.getField(_))
    // nested object fields carry no per-prop tokenization → no stopword set
    applyOp(c, w, None, Set.empty)
  }

  /** Is this path descending through a cref property into another collection? */
  private def isRefPath(schema: CollectionSchema, path: Seq[String]): Boolean =
    path.length >= 2 && schema.property(path.head).exists(_.dataType == PropType.Ref)

  /**
   * Ref leaf: run the tail filter on the target collection, semi-join ids back,
   * expose as a boolean helper column (so Not/Or still compose).
   * Ref-count filter (valueInt on the ref prop itself, path length 1) is
   * handled in `leaf` via refCount.
   */
  /** The target class of one ref-path hop: single-class refs take their
   * declared target (the path's class segment is informational); multi-class
   * refs dispatch on the path's class segment, which must be one of the
   * declared targets (MultipleRef — multi_reftype_bug_test.go's model). */
  private def refPathTarget(prop: Property, w: Where): String =
    prop.refTarget.getOrElse {
      val t = w.path(1)
      if (prop.refTargets.nonEmpty && !prop.refTargets.contains(t))
        fail(s"class '$t' is not a linked class of property '${w.path.head}' " +
          s"(linked: ${prop.refTargets.mkString(", ")})")
      t
    }

  private def compileRefLeaf(df: DataFrame, schema: CollectionSchema, w: Where, depth: Int): (DataFrame, Column) = {
    require(depth < 3, "nested-ref depth limit (reference: QueryNestedRefLimit)")
    val refProp = schema.property(w.path.head).get
    val target = resolve(refPathTarget(refProp, w))
    val tail = w.copy(path = w.path.drop(2))
    val (tPrepared, tCol) = compile(target.df, target.schema, tail, depth + 1)
    val matchingIds = tPrepared.filter(tCol)
      .select(col(target.schema.idColumn).alias("__target_id")).distinct()
    val flag = s"__ref_match_${df.columns.count(_.startsWith("__ref_match_"))}"
    val isArrayRef = df.schema(refProp.name).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]
    // left join against matching target ids; hit => flag true. Small dimension
    // sides broadcast automatically via AQE; the join key is the FK column.
    val joined = if (!isArrayRef) {
      df.join(
          matchingIds.withColumn("__hit", lit(true)),
          df(refProp.name) === col("__target_id"), "left")
        .withColumn(flag, coalesce(col("__hit"), lit(false)))
        .drop("__target_id", "__hit")
    } else {
      // multi-valued cref (beacon list): explode edges, equi-join on target
      // id, fold back to a per-object any-match flag (one shuffle on the id —
      // never a non-equi array_contains join). Multi-class edges store
      // beacons: parse the uuid out, and a class-qualified beacon only
      // counts when it names THIS hop's target class.
      val id = schema.idColumn
      val exploded = df.select(col(id), explode_outer(col(refProp.name)).as("__fk"))
      val edges = if (refProp.isMultiRef) {
        val stripped = regexp_replace(col("__fk"), "^[a-z][a-z0-9+.-]*://[^/]*/", "")
        exploded
          .filter(col("__fk").isNull ||
            instr(stripped, "/") === 0 ||
            split(stripped, "/").getItem(0) === lit(target.schema.name))
          .withColumn("__fk", lower(element_at(split(stripped, "/"), -1)))
      } else exploded
      val hits = edges
        .join(matchingIds.withColumn("__hit", lit(true)),
          col("__fk") === col("__target_id"), "left")
        .groupBy(col(id))
        .agg(max(coalesce(col("__hit"), lit(false))).as(flag))
      df.join(hits, Seq(id), "left")
        .withColumn(flag, coalesce(col(flag), lit(false)))
    }
    (joined, col(flag))
  }

  /** Pure-column leaf compilation. */
  def leaf(schema: CollectionSchema, w: Where): Column = {
    import FilterValue._
    val path = w.path
    // len(prop) pseudo-path (reference: searcher.go:945-970)
    val LenRe = "len\\((.+)\\)".r
    path.head match {
      case LenRe(p) =>
        val prop = schema.property(p)
        val lenCol = prop.map(_.dataType) match {
          case Some(PropType.Arr(_)) => size(col(p))
          case _                     => length(col(p))
        }
        return cmp(w.op, lenCol, w.value.get, None, Set.empty)
      case _ => ()
    }
    // metadata pseudo-props (reference: searcher.go:789-816); "id" is the
    // backwards-compat alias unless the class declares its own "id" prop
    def root(name: String): Column = name match {
      case "_id" => col(schema.idColumn)
      case "id" if schema.property("id").isEmpty => col(schema.idColumn)
      case "_creationTimeUnix" => col(schema.creationTimeColumn.getOrElse(
        throw new IllegalArgumentException(s"${schema.name} has no creation-time column")))
      case "_lastUpdateTimeUnix" => col(schema.updateTimeColumn.getOrElse(
        throw new IllegalArgumentException(s"${schema.name} has no update-time column")))
      case other => col(other)
    }
    val c = path.foldLeft(Option.empty[Column]) {
      case (None, p)      => Some(root(p))
      case (Some(acc), p) => Some(acc.getField(p))
    }.get
    // metadata-timestamp literals normalize onto the column's physical unit
    // (schema.timestampUnit): a valueDate RFC3339 literal or a digit string
    // compares numerically against the stored epoch (reference: the
    // timestamp pseudo-props accept valueDate, valueText and valueInt —
    // filters_validator.go:217-222 — all resolved to epoch ms there)
    if (path.head == "_creationTimeUnix" || path.head == "_lastUpdateTimeUnix") {
      val scale = if (schema.timestampUnit == "ms") 1L else 1000000L
      val epoch: Option[FilterValue] = w.value.flatMap {
        case FilterValue.DateV(ts) =>
          Some(FilterValue.IntV(ts.getTime * scale)) // getTime = epoch ms
        case FilterValue.TextV(s) if s.nonEmpty && s.forall(_.isDigit) =>
          Some(FilterValue.IntV(s.toLong)) // raw epoch in column units
        case _ => None
      }
      epoch.foreach { e =>
        return applyOp(c, w.copy(value = Some(e)), None,
          Tokenize.stopwordsFor(schema.stopwords))
      }
    }
    val prop = if (path.length == 1) schema.property(path.head) else None
    // struct-typed properties (phoneNumber, object) are not directly
    // comparable — the filter must descend into a subfield (reference:
    // filters_validator.go rejects scalar operators on struct types; geo is
    // the exception via WithinGeoRange)
    prop.map(_.dataType).foreach {
      case PropType.Phone | PropType.Obj if w.op != WhereOp.IsNull && w.op != WhereOp.WithinGeoRange =>
        throw new IllegalArgumentException(
          s"cannot apply ${w.op} directly to struct property '${path.head}' " +
          s"(${prop.get.dataType.name}) — filter a subfield, e.g. ${path.head}/national")
      case _ => ()
    }
    applyOp(c, w, prop, Tokenize.stopwordsFor(schema.stopwords))
  }

  /** Dispatch the leaf operator onto an already-resolved column. */
  private def applyOp(c: Column, w: Where, prop: Option[Property],
                      stop: Set[String]): Column = {
    import FilterValue._
    w.op match {
      case WhereOp.IsNull =>
        val BoolV(wantNull) = w.value.get: @unchecked
        if (wantNull) c.isNull else c.isNotNull
      case WhereOp.Like =>
        val TextV(rawPattern) = w.value.get: @unchecked
        // asciiFold props fold BOTH sides before matching (reference:
        // searcher.go:889-897 — LIKE folds manually, wildcards preserved)
        val fold = prop.exists(_.asciiFold)
        val pattern =
          if (fold) org.apache.spark.sql.graft.AsciiFold.fold(rawPattern) else rawPattern
        // `?` = one char, `*` = any run; anchored both ends (reference: inverted/like_regexp.go:41-58)
        val regex = "^" + java.util.regex.Pattern.quote(pattern)
          .replace("?", "\\E.\\Q").replace("*", "\\E.*\\Q") + "$"
        def likeOne(e0: Column): Column = {
          // undeclared targets (the id pseudo-prop on a numeric id column)
          // match against their string render
          val e = if (prop.isEmpty) e0.cast("string") else e0
          (if (fold) org.apache.spark.sql.graft.TextFunctions.asciiFold(e) else e)
            .rlike(regex)
        }
        // text[]: any element matches (the pattern walks the same per-element
        // value index a scalar text prop has)
        if (prop.exists(_.dataType == PropType.Arr(PropType.Text)))
          exists(c, likeOne) else likeOne(c)
      case WhereOp.WithinGeoRange =>
        val GeoRangeV(lat, lon, meters) = w.value.get: @unchecked
        val latC = c.getField("lat").cast("double")
        val lonC = c.getField("lon").cast("double")
        val exact = VectorFunctions.haversineMeters(
          latC, lonC, lit(lat), lit(lon)) <= lit(meters)
        // Bounding-box pre-filter: plain lat/lon range predicates that reach
        // the parquet scan's row-group min/max stats — the haversine
        // expression itself can never push down, so without the box a geo
        // filter at 100 TB reads every row. The box is a strict superset of
        // the circle: the meters-per-degree scale derives from the SAME
        // sphere haversineMeters uses (R = 6371000 → π·R/180 ≈ 111194.93 —
        // a mismatched 111320 under-sizes the box and silently drops rows
        // near the circle's edge), padded 0.1% for floating slack; lon
        // shrinks by cos(lat), bounded at the circle's most poleward
        // latitude. ANDing the exact haversine keeps results bit-identical.
        // Degenerate geometries fall back conservatively: near-pole circles
        // and antimeridian-crossing boxes drop the lon bound (lat bound
        // still prunes).
        val metersPerDeg = math.Pi * 6371000.0 / 180.0
        val dLat = meters / metersPerDeg * 1.001
        val latBound = latC >= lit(lat - dLat) && latC <= lit(lat + dLat)
        val maxAbsLat = math.abs(lat) + dLat
        val lonBound =
          if (maxAbsLat >= 89.0) None
          else {
            val dLon = meters / (metersPerDeg * math.cos(math.toRadians(maxAbsLat))) * 1.001
            if (lon - dLon < -180.0 || lon + dLon > 180.0) None
            else Some(lonC >= lit(lon - dLon) && lonC <= lit(lon + dLon))
          }
        lonBound.foldLeft(latBound && exact)(_ && _)
      case WhereOp.ContainsAny | WhereOp.ContainsAll | WhereOp.ContainsNone =>
        contains(w.op, c, w.value.get, prop, stop)
      case op =>
        cmp(op, c, w.value.get, prop, stop)
    }
  }

  /** Equality on tokenized text matches per-token (reference: searcher.go:869).
   * Word-tokenized filter terms drop the collection's stopwords (the index
   * keeps them — searcher.go:899-906); a value reduced to NOTHING by that
   * removal is the reference's ErrOnlyStopwords (searcher.go:943). */
  private def textTokenMatch(c: Column, prop: Option[Property], v: String,
                             stop: Set[String]): Column =
    textTokenTerms(c, prop, v, stop).map(_.reduce(_ && _)).getOrElse(lit(false))

  /** Per-term presence columns for a tokenized text value, or None when the
   * value has no usable terms. The multi-token split happens BEFORE the
   * operator applies (searcher.go:923-941: one propValuePair per term, each
   * keeping the ORIGINAL operator, joined by And) — so Equal reduces the
   * presence columns with AND, while NotEqual must negate EACH term and then
   * AND: NOT(t1) AND NOT(t2), not NOT(t1 AND t2)
   * (filtered_search_test.go's 625-row NotEqual contract). */
  private def textTokenTerms(c: Column, prop: Option[Property], v: String,
                             stop: Set[String]): Option[Seq[Column]] = {
    val mode = prop.map(_.tokenization).getOrElse(Tokenization.Word)
    val fold = prop.exists(_.asciiFold)
    val raw = Tokenize.queryTokens(mode, v, fold)
    val qToks = if (mode == Tokenization.Word) raw.filterNot(stop) else raw
    if (qToks.isEmpty && raw.nonEmpty) Tokenize.onlyStopwordsError()
    if (qToks.isEmpty) None
    else {
      // text[] props match against the MERGED per-element token multiset —
      // the searchable index for a text array holds every element's tokens
      // (analyzer.go:174-195), so a filter term hits any element
      val toks = Tokenize.propTokens(mode, fold, isTextArray(prop))(c)
      Some(qToks.map(t => array_contains(toks, t)))
    }
  }

  private def isTextArray(prop: Option[Property]): Boolean =
    prop.exists(_.dataType == PropType.Arr(PropType.Text))

  /** Token-level matching applies to text AND text[] under any non-field
   * tokenization (the filter consults the searchable token index either
   * way — searcher.go:869). */
  private def isTokenizedText(prop: Option[Property]): Boolean =
    prop.exists(p => (p.dataType == PropType.Text ||
        p.dataType == PropType.Arr(PropType.Text)) &&
      p.tokenization != Tokenization.Field)

  private def cmp(op: WhereOp, c: Column, v: FilterValue, prop: Option[Property],
                  stop: Set[String]): Column = {
    import FilterValue._
    val value: Column = v match {
      case IntV(x)    => lit(x)
      case NumberV(x) => lit(x)
      case TextV(x)   => lit(x)
      case BoolV(x)   => lit(x)
      case DateV(x)   => lit(x)
      case other      => throw new IllegalArgumentException(s"unsupported cmp value $other")
    }
    val isArrayProp = prop.exists(_.dataType.isInstanceOf[PropType.Arr])
    op match {
      case WhereOp.Equal =>
        v match {
          case TextV(s) if isTokenizedText(prop) => textTokenMatch(c, prop, s, stop)
          // non-tokenized arrays (field text[], int[], …): any element equals
          case _ if isArrayProp => array_contains(c, value)
          case _ => c === value
        }
      case WhereOp.NotEqual =>
        v match {
          case TextV(s) if isTokenizedText(prop) =>
            // per-term NotEqual children joined by And (searcher.go:938):
            // a doc matches only when it carries NONE of the value's terms
            textTokenTerms(c, prop, s, stop)
              .map(_.map(t => !t).reduce(_ && _)).getOrElse(lit(false))
          case _ if isArrayProp => !array_contains(c, value)
          case _ => c =!= value
        }
      case WhereOp.GreaterThan      => c > value
      case WhereOp.GreaterThanEqual => c >= value
      case WhereOp.LessThan         => c < value
      case WhereOp.LessThanEqual    => c <= value
      case other => throw new IllegalArgumentException(s"unsupported op $other")
    }
  }

  /**
   * Contains* (reference: filters.go:36-38; desugar searcher.go:1253-1455):
   * on array props it is set overlap/superset; on scalar props Any = IN-list,
   * All = every value equals (useful only with 1 value), None = NOT IN
   * *including null rows* (reference treats None as complement incl. nulls).
   * On tokenized text, values match per-token.
   */
  private def contains(op: WhereOp, c: Column, v: FilterValue, prop: Option[Property],
                       stop: Set[String]): Column = {
    import FilterValue._
    val ListV(vs) = v: @unchecked
    val lits = vs.map {
      case IntV(x) => lit(x); case NumberV(x) => lit(x); case TextV(x) => lit(x)
      case BoolV(x) => lit(x); case DateV(x) => lit(x)
      case other => throw new IllegalArgumentException(s"bad contains value $other")
    }
    val isArrayProp = prop.exists(_.dataType.isInstanceOf[PropType.Arr])
    val tokenized = isTokenizedText(prop)
    def one(value: Column, raw: FilterValue): Column =
      // tokenized text (scalar OR array) matches per-token — textTokenMatch
      // merges a text[] prop's element tokens; other arrays (int[], field-
      // tokenized text[], …) match whole elements
      if (tokenized) raw match {
        case TextV(s) => textTokenMatch(c, prop, s, stop)
        case _        => if (isArrayProp) array_contains(c, value) else c === value
      }
      else if (isArrayProp) array_contains(c, value)
      else c === value
    // ContainsAny skips a value that stopword removal empties (at least one
    // usable term → proceed), erroring only when EVERY value was stopwords;
    // other operators let the per-value error propagate (reference:
    // searcher.go:597-640 — the ErrOnlyStopwords special case is
    // ContainsAny-scoped).
    val per: Seq[Column] = op match {
      case WhereOp.ContainsAny =>
        val usable = lits.zip(vs).flatMap { case (l, raw) =>
          try Some(one(l, raw))
          catch { case e: IllegalArgumentException if e.getMessage.contains("only stopwords") => None }
        }
        if (usable.isEmpty && vs.nonEmpty) Tokenize.onlyStopwordsError()
        usable
      case _ => lits.zip(vs).map { case (l, raw) => one(l, raw) }
    }
    op match {
      case WhereOp.ContainsAny  => per.reduce(_ || _)
      case WhereOp.ContainsAll  => per.reduce(_ && _)
      case WhereOp.ContainsNone => coalesce(!per.reduce(_ || _), lit(true))
      case other => throw new IllegalArgumentException(s"$other")
    }
  }
}
