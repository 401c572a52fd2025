package graft.engine

import org.json4s._

import graft.model._

/**
 * GraphQL wire decoder — parses the reference's GraphQL query documents
 * (`{ Get { Class(where: ..., hybrid: ...) { props _additional { ... } } } }`
 * and the `Aggregate` form) into the engine's `GetParams` /
 * `AggregateParams` IR. This is the THIRD wire shape next to the gRPC
 * `SearchRequest` JSON and the REST `where` tree in [[WireDecoder]]: a user
 * migrating a weaviate GraphQL query pastes the document verbatim and gets
 * the same plan the programmatic API builds.
 *
 * The document parser is a small hand-rolled lexer + recursive descent over
 * the GraphQL-spec query-document subset the reference's API surface uses:
 * one operation, fields with argument literals (Int/Float/String/Boolean/
 * Enum/List/InputObject), selection sets, inline fragments
 * (`... on Class`) for cross-reference properties, operation VARIABLES
 * (`query ($x: Float!) { ... }` + a variables JSON object, typed per the
 * declaration with graphql-go's enum coercion and missing-variable error
 * text), field ALIASES (`alias: field`, surfaced as output renames —
 * see [[applyAliases]]), NAMED FRAGMENT definitions + spreads (spec §2.8 —
 * the Apollo-codegen document shape; spreads substitute as type-conditioned
 * inline fragments, class-typed fragments flatten into the class selection),
 * and the two spec directives `@skip(if:)` / `@include(if:)` (§3.13,
 * evaluated against resolved variables). Other directives reject loudly.
 *
 * Argument semantics and error texts follow the reference's extraction
 * layer verbatim:
 *  - adapters/handlers/graphql/local/get/class_builder_fields.go:333-561
 *    (resolveGet: per-argument extraction order + error wrapping,
 *    extractProperties/_additional, extractGroup)
 *  - adapters/handlers/graphql/local/common_filters/{filters.go,
 *    parse_filters_into_ast.go} (where → filterext.Parse — shared with
 *    [[WireDecoder.restParse]]), near_vector.go, near_object.go,
 *    nearText.go, hybrid.go, bm25.go, extract_targets.go, group_by.go
 *  - adapters/handlers/graphql/local/aggregate/resolver.go:62-305
 *    (Aggregate: selection-set aggregators via
 *    entities/aggregation/params.go ParseAggregatorProp, groupBy path,
 *    objectLimit gating)
 *  - entities/filters/{pagination.go,cursor.go} (limit/offset/autocut/after)
 */
object GraphQL {

  import WireDecoder.WireError
  private def fail(msg: String): Nothing = throw new WireError(msg)

  // ==========================================================================
  // GraphQL value / document AST
  // ==========================================================================

  sealed trait GVal
  final case class GInt(v: Long) extends GVal
  final case class GFloat(v: Double) extends GVal
  final case class GStr(v: String) extends GVal
  final case class GBool(v: Boolean) extends GVal
  case object GNull extends GVal
  final case class GEnum(name: String) extends GVal
  final case class GList(items: List[GVal]) extends GVal
  final case class GObj(fields: List[(String, GVal)]) extends GVal {
    def get(name: String): Option[GVal] = fields.collectFirst { case (`name`, v) => v }
  }

  sealed trait GSel
  final case class GField(name: String, args: List[(String, GVal)], sel: List[GSel],
      alias: Option[String] = None) extends GSel {
    def arg(name: String): Option[GVal] = args.collectFirst { case (`name`, v) => v }
    /** The reply key: the alias when given, else the field name (spec §2.7). */
    def outputName: String = alias.getOrElse(name)
  }
  final case class GInlineFrag(onType: String, sel: List[GSel]) extends GSel
  /** Named-fragment spread (`...Name`) — substituted away by the parser's
   * fragment-resolution pass; never reaches the decoders. */
  private final case class GSpread(name: String) extends GSel

  /** Go fmt `%v` rendering of a decoded GraphQL value (maps print sorted by
   * key, like Go's fmt since 1.12) — used in replayed reference error texts. */
  private def goV(v: GVal): String = v match {
    case GInt(i) => i.toString
    case GFloat(d) => WireDecoder.goFloat(d)
    case GStr(s) => s
    case GBool(b) => b.toString
    case GNull => "<nil>"
    case GEnum(n) => n
    case GList(xs) => xs.map(goV).mkString("[", " ", "]")
    case GObj(fs) => fs.sortBy(_._1).map { case (k, x) => s"$k:${goV(x)}" }
      .mkString("map[", " ", "]")
  }

  // ==========================================================================
  // Lexer + recursive-descent parser
  // ==========================================================================

  private final class Parser(src: String, varValues: Map[String, GVal] = Map.empty) {
    private var i = 0
    // $name → value, populated from the operation's variable definitions
    // (declared type + provided value/default); reads happen in value()
    private var resolvedVars = Map.empty[String, GVal]

    private def ws(): Unit = {
      while (i < src.length) {
        val c = src.charAt(i)
        if (c == '#') { while (i < src.length && src.charAt(i) != '\n') i += 1 }
        else if (c.isWhitespace || c == ',') i += 1
        else return
      }
    }
    private def peek(): Char = { ws(); if (i < src.length) src.charAt(i) else '\u0000' }
    private def expect(c: Char): Unit = {
      if (peek() != c) fail(s"graphql parse: expected '$c' at offset $i")
      i += 1
    }
    private def isNameStart(c: Char) = c == '_' || c.isLetter
    private def isNamePart(c: Char) = c == '_' || c.isLetterOrDigit

    private def name(): String = {
      ws()
      if (i >= src.length || !isNameStart(src.charAt(i)))
        fail(s"graphql parse: expected a name at offset $i")
      val start = i
      while (i < src.length && isNamePart(src.charAt(i))) i += 1
      src.substring(start, i)
    }

    private def stringLit(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < src.length && src.charAt(i) != '"') {
        val c = src.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= src.length) fail("graphql parse: unterminated string")
          src.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              if (i + 4 >= src.length) fail("graphql parse: bad \\u escape")
              val hex = src.substring(i + 1, i + 5)
              // ASCII hex only — Character.isDigit would admit Unicode
              // digit classes that Integer.parseInt also honors
              if (!hex.forall(c => ('0' <= c && c <= '9') ||
                  ('a' <= c.toLower && c.toLower <= 'f')))
                fail(s"graphql parse: bad \\u escape '$hex'")
              sb += Integer.parseInt(hex, 16).toChar
              i += 4
            case o => fail(s"graphql parse: unknown escape '\\$o'")
          }
          i += 1
        } else { sb += c; i += 1 }
      }
      expect('"')
      sb.result()
    }

    private def number(): GVal = {
      val start = i
      if (src.charAt(i) == '-') i += 1
      while (i < src.length && src.charAt(i).isDigit) i += 1
      var isFloat = false
      if (i < src.length && src.charAt(i) == '.') {
        isFloat = true; i += 1
        while (i < src.length && src.charAt(i).isDigit) i += 1
      }
      if (i < src.length && (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
        isFloat = true; i += 1
        if (i < src.length && (src.charAt(i) == '+' || src.charAt(i) == '-')) i += 1
        while (i < src.length && src.charAt(i).isDigit) i += 1
      }
      val text = src.substring(start, i)
      // "-" alone, "1e" etc. must fail as parse errors, not leak
      // NumberFormatException past the decoder's WireError contract
      try { if (isFloat) GFloat(text.toDouble) else GInt(text.toLong) }
      catch { case _: NumberFormatException =>
        fail(s"graphql parse: malformed number '$text' at offset $start") }
    }

    private def value(): GVal = peek() match {
      case '"' => GStr(stringLit())
      case '[' =>
        expect('[')
        val items = List.newBuilder[GVal]
        while (peek() != ']') items += value()
        expect(']')
        GList(items.result())
      case '{' =>
        expect('{')
        val fields = List.newBuilder[(String, GVal)]
        while (peek() != '}') {
          val n = name(); expect(':'); fields += (n -> value())
        }
        expect('}')
        GObj(fields.result())
      case '$' =>
        expect('$')
        val vn = name()
        resolvedVars.getOrElse(vn, fail(s"""Variable "$$$vn" is not defined."""))
      case c if c == '-' || c.isDigit => ws(); number()
      case c if isNameStart(c) =>
        name() match {
          case "true" => GBool(true)
          case "false" => GBool(false)
          case "null" => GNull
          case n => GEnum(n)
        }
      case c => fail(s"graphql parse: unexpected character '$c' at offset $i")
    }

    private def arguments(): List[(String, GVal)] =
      if (peek() != '(') Nil
      else {
        expect('(')
        val args = List.newBuilder[(String, GVal)]
        while (peek() != ')') {
          val n = name(); expect(':'); args += (n -> value())
        }
        expect(')')
        args.result()
      }

    /** graphql-go's location-annotated syntax error (gqlerrors/syntax.go —
     * `Syntax Error GraphQL request (L:C) Unexpected Name "x"` plus the
     * offending source line with a caret): the text weaviate's GraphQL
     * endpoint returns for a document that does not start with an operation
     * (batch_request_endpoints/graphql_test.go pins it verbatim). */
    private def syntaxError(offset: Int, unexpected: String): Nothing = {
      val before = src.substring(0, offset)
      val line = before.count(_ == '\n') + 1
      val col = offset - before.lastIndexOf('\n')
      val lineText = src.split("\n", -1)(line - 1)
      val prefix = s"$line: "
      val caret = " " * (prefix.length + col - 1) + "^"
      fail(s"""Syntax Error GraphQL request ($line:$col) Unexpected Name "$unexpected"""" +
        "\n\n" + prefix + lineText + "\n" + caret + "\n")
    }

    /** `@skip(if:)` / `@include(if:)` (spec §3.13) — evaluated eagerly
     * (variables are already resolved), returning whether the selection is
     * KEPT: all includes true AND all skips false. Unknown directives reject
     * loudly. */
    private def directivesKeep(): Boolean = {
      var keep = true
      while (peek() == '@') {
        expect('@')
        val dn = name()
        val args = arguments()
        dn match {
          case "skip" | "include" =>
            val cond = args.collectFirst { case ("if", v) => v }.getOrElse(
              fail(s"""graphql parse: directive "@$dn" requires an "if" argument"""))
            val b = cond match {
              case GBool(x) => x
              case other => fail(s"""graphql parse: "@$dn(if:)" must be a Boolean, got ${goV(other)}""")
            }
            if (dn == "skip" && b) keep = false
            if (dn == "include" && !b) keep = false
          case other =>
            fail(s"""graphql parse: unknown directive "@$other"""")
        }
        ws()
      }
      keep
    }

    private def selection(): List[GSel] = {
      ws()
      if (src.startsWith("...", i)) {
        i += 3
        ws()
        val kw = name()
        if (kw == "on") {
          val tpe = name()
          ws()
          val keep = directivesKeep()
          val sel = selectionSet()
          if (keep) List(GInlineFrag(tpe, sel)) else Nil
        } else {
          // named-fragment spread — resolved after the whole document parses
          // (definitions may follow their uses, spec §2.8)
          ws()
          val keep = directivesKeep()
          if (keep) List(GSpread(kw)) else Nil
        }
      } else {
        val n = name()
        // `alias: field` (GraphQL spec §2.7) — the alias becomes the reply key
        val (alias, fieldName) =
          if (peek() == ':') { i += 1; (Some(n), name()) } else (None, n)
        val args = arguments()
        ws()
        val keep = directivesKeep()
        val sel = if (peek() == '{') selectionSet() else Nil
        if (keep) List(GField(fieldName, args, sel, alias)) else Nil
      }
    }

    private def selectionSet(): List[GSel] = {
      expect('{')
      val sels = List.newBuilder[GSel]
      while (peek() != '}') sels ++= selection()
      expect('}')
      sels.result()
    }

    /** `($x: Type = default, ...)` — the operation's variable definitions.
     * Each declared variable resolves, in spec order, to: the provided
     * value (string values coerce to enum names when the declared base
     * type is not a built-in scalar, like graphql-go's variable coercion),
     * else the declared default, else null — unless the type is non-null,
     * which is the reference's missing-variable error. */
    private def variableDefinitions(): Unit = {
      expect('(')
      while (peek() != ')') {
        expect('$')
        val vn = name()
        expect(':')
        val tStart = { ws(); i }
        val (baseType, nonNull) = typeRef()
        val typeText = src.substring(tStart, i)
        val default = if (peek() == '=') { i += 1; Some(value()) } else None
        val scalarBases = Set("Int", "Float", "String", "Boolean", "ID")
        def coerce(v: GVal): GVal = v match {
          case GStr(sv) if !scalarBases.contains(baseType) => GEnum(sv)
          case GList(xs) => GList(xs.map(coerce))
          case other => other
        }
        val resolved = varValues.get(vn).map(coerce).orElse(default).getOrElse {
          if (nonNull)
            fail(s"""Variable "$$$vn" of required type "$typeText" was not provided.""")
          GNull
        }
        resolvedVars += vn -> resolved
      }
      expect(')')
    }

    /** Type reference `Name | [Type] | Type!` → (base name, top non-null). */
    private def typeRef(): (String, Boolean) = {
      ws()
      if (peek() == '[') {
        expect('[')
        val (base, _) = typeRef()
        expect(']')
        val nn = peek() == '!'
        if (nn) i += 1
        (base, nn)
      } else {
        val n = name()
        val nn = peek() == '!'
        if (nn) i += 1
        (n, nn)
      }
    }

    /** Parse a query document: one operation (optional `query [Name]` header
     * + selection set) plus any number of named FRAGMENT DEFINITIONS
     * (`fragment Name on Type { ... }` — spec §2.8, before or after the
     * operation, the Apollo-codegen document shape). Spreads substitute as
     * type-conditioned inline fragments after the whole document parses;
     * an unused-at-cycle spread rejects loudly. */
    def document(): List[GSel] = {
      var op: Option[List[GSel]] = None
      val fragments = scala.collection.mutable.Map.empty[String, (String, List[GSel])]
      ws()
      while (i < src.length) {
        if (isNameStart(src.charAt(i))) {
          val off = i
          val kw = name()
          kw match {
            case "query" =>
              ws()
              if (i < src.length && isNameStart(src.charAt(i))) name() // operation name
              if (peek() == '(') variableDefinitions()
              if (op.isDefined)
                fail(s"graphql parse: unexpected content after document at offset $i")
              op = Some(selectionSet())
            case "fragment" =>
              val fn = name()
              if (fn == "on") fail("graphql parse: fragment name cannot be 'on'")
              if (name() != "on") fail(s"graphql parse: expected 'on' in fragment '$fn'")
              val tpe = name()
              if (fragments.contains(fn))
                fail(s"""graphql parse: duplicate fragment definition "$fn"""")
              fragments += fn -> (tpe, selectionSet())
            case "mutation" | "subscription" =>
              fail(s"graphql parse: unsupported operation type '$kw' (only queries)")
            case other =>
              // any OTHER leading name is a lexer-level surprise — graphql-go
              // renders its location-annotated Syntax Error (the batch
              // endpoint acceptance pins the text verbatim)
              syntaxError(off, other)
          }
        } else if (peek() == '{') {
          if (op.isDefined)
            fail(s"graphql parse: unexpected content after document at offset $i")
          op = Some(selectionSet())
        } else fail(s"graphql parse: unexpected content after document at offset $i")
        ws()
      }
      val sels = op.getOrElse(fail("graphql parse: document has no operation"))
      def resolve(ss: List[GSel], seen: Set[String]): List[GSel] = ss.map {
        case GSpread(n) =>
          val (onType, fsel) = fragments.getOrElse(n,
            fail(s"""Unknown fragment "$n"."""))
          if (seen(n)) fail(s"""graphql parse: fragment cycle through "$n"""")
          GInlineFrag(onType, resolve(fsel, seen + n))
        case GInlineFrag(t, s) => GInlineFrag(t, resolve(s, seen))
        case f: GField => f.copy(sel = resolve(f.sel, seen))
      }
      resolve(sels, Set.empty)
    }
  }

  /** Flatten inline fragments whose type condition IS the enclosing class
   * (`{ Get { City { ...CityFields } } }` with `fragment CityFields on
   * City` — the fragment's selections belong to the class itself, not to a
   * reference target). Applied at the class level of Get/Aggregate decode;
   * fragments on OTHER types stay put for the ref-resolution scope rules. */
  private def flattenSelfFrags(className: String, sel: List[GSel]): List[GSel] =
    sel.flatMap {
      case GInlineFrag(t, s) if t == className => flattenSelfFrags(className, s)
      case other => List(other)
    }

  // ==========================================================================
  // Shared argument helpers
  // ==========================================================================

  private def asObj(v: GVal, ctx: String): GObj = v match {
    case o: GObj => o
    case other => fail(s"$ctx must be an object, got ${goV(other)}")
  }
  private def asList(v: GVal, ctx: String): List[GVal] = v match {
    case GList(xs) => xs
    case other => fail(s"$ctx must be a list, got ${goV(other)}")
  }
  private def asStr(v: GVal, ctx: String): String = v match {
    case GStr(s) => s
    case other => fail(s"$ctx must be a string, got ${goV(other)}")
  }
  private def asNum(v: GVal, ctx: String): Double = v match {
    case GFloat(d) => d
    case GInt(i) => i.toDouble
    case other => fail(s"$ctx must be a number, got ${goV(other)}")
  }
  private def asInt(v: GVal, ctx: String): Int = v match {
    case GInt(i) => i.toInt
    case other => fail(s"$ctx must be an int, got ${goV(other)}")
  }
  private def asBool(v: GVal, ctx: String): Boolean = v match {
    case GBool(b) => b
    case other => fail(s"$ctx must be a boolean, got ${goV(other)}")
  }
  private def strList(v: GVal, ctx: String): Seq[String] =
    asList(v, ctx).map(asStr(_, ctx))
  private def floatList(v: GVal, ctx: String): Array[Float] =
    asList(v, ctx).map(x => asNum(x, ctx).toFloat).toArray

  /** beacon `weaviate://localhost/[Class/]id` → the target id (the HTTP
   * layer's crossref parsing; both the id and beacon forms resolve to the
   * same object lookup — reference: entities/schema/crossref/crossref.go). */
  private def beaconId(beacon: String): String = {
    val seg = beacon.split('/').filter(_.nonEmpty)
    if (seg.isEmpty) fail(s"invalid beacon: $beacon")
    seg.last
  }
  private def idValue(id: String): Any =
    if (id.nonEmpty && id.forall(_.isDigit)) id.toLong else id

  // ==========================================================================
  // where → Where (via filterext, shared with the REST tree decoder)
  // ==========================================================================

  /** GraphQL `where` input → the filterext JSON tree. filterMapToModel
   * (parse_filters_into_ast.go:43-147) folds a scalar-or-list `value<T>`
   * into the model's scalar/array pair; its type errors carry Go's `%T`. */
  private def whereToJson(v: GVal): JValue = v match {
    case GObj(fields) =>
      JObject(fields.map {
        case (k @ ("valueInt" | "valueNumber"), GList(xs)) =>
          k + "Array" -> JArray(xs.map {
            case GInt(i) => JLong(i)
            case GFloat(d) => JDouble(d)
            case o => fail(s"failed to extract filters: unsupported type: '${goType(o)}'")
          })
        case (k @ ("valueText" | "valueString" | "valueDate"), GList(xs)) =>
          k + "Array" -> JArray(xs.map {
            case GStr(s) => JString(s)
            case o => fail(s"failed to extract filters: unsupported type: '${goType(o)}'")
          })
        case ("valueBoolean", GList(xs)) =>
          "valueBooleanArray" -> JArray(xs.map {
            case GBool(b) => JBool(b)
            case o => fail(s"failed to extract filters: unsupported type: '${goType(o)}'")
          })
        case ("valueInt", o) if !o.isInstanceOf[GInt] && !o.isInstanceOf[GFloat] =>
          fail(s"failed to extract filters: unsupported type: '${goType(o)}'")
        case ("valueNumber", o) if !o.isInstanceOf[GInt] && !o.isInstanceOf[GFloat] =>
          fail(s"failed to extract filters: unsupported type: '${goType(o)}'")
        case (k @ ("valueText" | "valueString" | "valueDate"), o) if !o.isInstanceOf[GStr] =>
          fail(s"failed to extract filters: unsupported type: '${goType(o)}'")
        // a bare-string path coerces to the single-element list (GraphQL
        // list-input coercion — the acceptance suite writes
        // `path: "len(name)"`, local_get_with_filter_test.go:66)
        case ("path", GStr(p)) => "path" -> JArray(List(JString(p)))
        case (k, x) => k -> plainJson(x)
      })
    case other => fail(s"where must be an object, got ${goV(other)}")
  }

  /** Go's `%T` for the JSON-decoded value the reference would have seen
   * (numbers arrive as float64 through encoding/json). */
  private def goType(v: GVal): String = v match {
    case _: GBool => "bool"
    case _: GStr => "string"
    case _: GInt | _: GFloat => "float64"
    case _: GEnum => "string"
    case _: GList => "[]interface {}"
    case _: GObj => "map[string]interface {}"
    case GNull => "<nil>"
  }

  private def plainJson(v: GVal): JValue = v match {
    case GInt(i) => JLong(i)
    case GFloat(d) => JDouble(d)
    case GStr(s) => JString(s)
    case GBool(b) => JBool(b)
    case GNull => JNull
    case GEnum(n) => JString(n)
    case GList(xs) => JArray(xs.map(plainJson))
    case o: GObj => whereToJson(o)
  }

  private def decodeWhere(g: Graft, collection: String, v: GVal): Where =
    try WireDecoder.restParse(g, collection, whereToJson(v))
    catch {
      // resolveGet wraps every filter-extraction error — both
      // filterMapToModel's ("failed to extract filters: ...", produced by
      // whereToJson above) and filterext.Parse's per-level
      // "invalid where filter:" texts (restParse) — in one outer layer
      // (class_builder_fields.go:389-391).
      case e: WireError => fail(s"could not extract filters: ${e.getMessage}")
    }

  // ==========================================================================
  // targets / combination (common_filters/extract_targets.go)
  // ==========================================================================

  private def extractTargets(src: GObj): (Seq[String], Option[TargetCombination]) =
    src.get("targets") match {
      case Some(t) =>
        val targets = asObj(t, "targets")
        val tvsVal = targets.get("targetVectors").getOrElse(
          fail(s"targetVectors is required field, got ${goV(t)}"))
        val tvs = asList(tvsVal, "targetVectors").map {
          case GStr(s) => s
          case o => fail(s"target vector is not a string, got ${goV(o)}")
        }
        val method = targets.get("combinationMethod").map {
          case GEnum(n) => n
          case o => fail(s"combinationMethod is not a TargetCombinationType, got ${goV(o)}")
        }
        val weightsIn: Map[String, GVal] = targets.get("weights") match {
          case Some(o: GObj) => o.fields.toMap
          case _ => Map.empty
        }
        // GraphQL weights arrive as a name→float map; the engine's
        // combination weights are POSITIONAL (aligned with targetVectors),
        // so resolve each position's name against the map here
        def weights(): Seq[Double] = {
          val byName = tvs.distinct.map { t =>
            val w = weightsIn.getOrElse(t, fail(s"weight for target $t is not provided"))
            t -> (w match {
              case GFloat(d) => d
              case GInt(i) => i.toDouble
              case GList(List(single)) => asNum(single, "weights")
              case o => fail(s"weight for target $t is not a float or list of floats, got ${goV(o)}")
            })
          }.toMap
          tvs.map(byName)
        }
        val combo = method match {
          case None | Some("minimum") => TargetCombination.Minimum
          case Some("average") => TargetCombination.Average
          case Some("sum") => TargetCombination.Sum
          case Some("manualWeights") => TargetCombination.ManualWeights(weights())
          case Some("relativeScore") => TargetCombination.RelativeScore(weights())
          case Some(o) => fail(s"unknown combination method $o")
        }
        (tvs, Some(combo))
      case None =>
        src.get("targetVectors") match {
          case Some(tv) => (strList(tv, "targetVectors"), Some(TargetCombination.Minimum))
          case None => (Nil, None)
        }
    }

  // ==========================================================================
  // near legs (common_filters/{near_vector,near_object,nearText}.go)
  // ==========================================================================

  private def distCert(src: GObj, ctx: String): (Option[Double], Option[Double]) = {
    val cert = src.get("certainty").map(asNum(_, s"$ctx.certainty"))
    val dist = src.get("distance").map(asNum(_, s"$ctx.distance"))
    if (cert.isDefined && dist.isDefined) fail("cannot provide distance and certainty")
    (dist, cert)
  }

  /** ExtractNearVector (near_vector.go:23-120). `targetsFromOuter` is the
   * hybrid path: the outer search's targets replace the leg's own. */
  private def extractNearVector(src: GObj, targetsFromOuter: Option[Seq[String]])
      : Either[NearVector, NearMultiVector] = {
    val vectorArg = src.get("vector")
    val perTargetArg = src.get("vectorPerTarget")
    if (vectorArg.isEmpty == perTargetArg.isEmpty)
      fail("vector or vectorPerTarget is required field")
    val (dist, cert) = distCert(src, "nearVector")

    val (ownTvs, combo) = extractTargets(src)
    val tvs = targetsFromOuter.getOrElse(ownTvs)

    vectorArg match {
      case Some(GList(items)) if items.nonEmpty && items.head.isInstanceOf[GList] =>
        // [[Float]] — a ColBERT-style multi-vector query bag
        Right(NearMultiVector(items.map(floatList(_, "vector")).toArray, targetVectors = tvs))
      case Some(v) =>
        Left(NearVector(floatList(v, "vector"), metric = Metric.Default,
          distance = dist, certainty = cert, targetVectors = tvs,
          combination = combo.getOrElse(TargetCombination.Minimum)))
      case None =>
        val perTarget = asObj(perTargetArg.get, "vectorPerTarget")
        // expand list-of-list entries into repeated targets, preserving the
        // reference's key-driven expansion (near_vector.go:73-113)
        val entries: Seq[(String, Array[Float])] = {
          val keys = if (tvs.nonEmpty) tvs else perTarget.fields.map(_._1)
          keys.flatMap { t =>
            perTarget.get(t) match {
              case Some(GList(items)) if items.nonEmpty && items.head.isInstanceOf[GList] =>
                items.map(v => t -> floatList(v, "vectorPerTarget"))
              case Some(v) => Seq(t -> floatList(v, "vectorPerTarget"))
              case None => fail(s"vectorPerTarget: vector for target $t is required")
            }
          }
        }
        if (entries.isEmpty)
          fail("vectorPerTarget must contain at least one target vector")
        // the key-driven expansion may repeat target names; positional
        // weights expand alongside (each expanded entry inherits its
        // target's weight)
        val keys = if (tvs.nonEmpty) tvs else perTarget.fields.map(_._1)
        def expand(ws: Seq[Double]): Seq[Double] = {
          val byName = keys.zip(ws).toMap
          entries.map(e => byName.getOrElse(e._1, 1.0))
        }
        val combo2 = combo.map {
          case TargetCombination.ManualWeights(ws) => TargetCombination.ManualWeights(expand(ws))
          case TargetCombination.RelativeScore(ws) => TargetCombination.RelativeScore(expand(ws))
          case other => other
        }
        Left(NearVector(entries.head._2, metric = Metric.Default,
          distance = dist, certainty = cert,
          targetVectors = entries.map(_._1),
          combination = combo2.getOrElse(TargetCombination.Minimum),
          vectors = TargetQuery.singles(entries.map(_._2))))
    }
  }

  private def extractNearObject(src: GObj): NearObject = {
    val id = src.get("id").map(asStr(_, "nearObject.id"))
      .orElse(src.get("beacon").map(b => beaconId(asStr(b, "nearObject.beacon"))))
      .getOrElse(fail("nearObject params: empty id and beacon"))
    val (dist, cert) = distCert(src, "nearObject")
    val (tvs, _) = extractTargets(src)
    NearObject(idValue(id), metric = Metric.Default, distance = dist,
      certainty = cert, targetVectors = tvs)
  }

  private def extractMove(v: GVal): MoveParams = {
    val m = asObj(v, "move")
    MoveParams(
      concepts = m.get("concepts").map(strList(_, "move.concepts")).getOrElse(Nil),
      force = m.get("force").map(asNum(_, "move.force")).getOrElse(0.0),
      objects = m.get("objects").map(asList(_, "move.objects")).getOrElse(Nil).map { o =>
        val obj = asObj(o, "move.objects")
        val id = obj.get("id").map(asStr(_, "move.objects.id"))
          .orElse(obj.get("beacon").map(b => beaconId(asStr(b, "move.objects.beacon"))))
          .getOrElse(fail("nearText: move objects require an id or beacon"))
        idValue(id)
      })
  }

  private def extractNearText(src: GObj, inHybrid: Boolean): NearText = {
    // a bare string coerces to the single-element list (GraphQL list-input
    // coercion — the acceptance grouping test sends `concepts: "Apple"`)
    val concepts = src.get("concepts").getOrElse(
      fail("nearText: concepts is a required field")) match {
      case GStr(one) => Seq(one)
      case other => strList(other, "nearText.concepts")
    }
    val autocorrect = src.get("autocorrect").exists(asBool(_, "nearText.autocorrect"))
    if (inHybrid && autocorrect) fail("autocorrect is not supported for hybrid nearText")
    val (dist, cert) = distCert(src, "nearText")
    val (tvs, _) = extractTargets(src)
    NearText(concepts, metric = Metric.Default, distance = dist, certainty = cert,
      moveTo = src.get("moveTo").map(extractMove),
      moveAwayFrom = src.get("moveAwayFrom").map(extractMove),
      targetVectors = tvs, autocorrect = autocorrect)
  }

  // ==========================================================================
  // bm25 / hybrid (common_filters/{bm25,hybrid}.go)
  // ==========================================================================

  private def extractSearchOperator(v: GVal): SearchOperator = {
    val so = asObj(v, "searchOperator")
    val min = so.get("minimumOrTokensMatch").map(asInt(_, "minimumOrTokensMatch")).getOrElse(1)
    so.get("operator") match {
      case Some(GEnum("And")) => SearchOperator.AndOp
      case Some(GEnum("AndCross")) => SearchOperator.AndCross
      case Some(GEnum("Or")) | None => SearchOperator.Or(min)
      case Some(o) => fail(s"searchOperator: unknown operator ${goV(o)}")
    }
  }

  private def extractBm25(src: GObj): Bm25 =
    Bm25(
      query = src.get("query").map(asStr(_, "bm25.query")).getOrElse(""),
      properties = src.get("properties").map(strList(_, "bm25.properties")).getOrElse(Nil),
      searchOperator = src.get("searchOperator").map(extractSearchOperator)
        .getOrElse(SearchOperator.Or(1)))

  private def extractHybrid(src: GObj): Hybrid = {
    val (tvs, _) = extractTargets(src)

    // searches: [{nearText: ... | nearVector: ...}] — only the first list
    // element is read (hybrid.go:47-70)
    var nearTxt: Option[NearText] = None
    var nearVec: Option[NearVector] = None
    src.get("searches").foreach { s =>
      // GraphQL list-input coercion: a single object value coerces to a
      // one-element list (spec §5.6.1 — graphql-go does this for the
      // acceptance suite's `searches: { nearText: ... }` shorthand)
      val coerced = s match { case o: GObj => GList(List(o)); case other => other }
      asList(coerced, "hybrid.searches").headOption.foreach { first =>
        val named = asObj(first, "hybrid.searches")
        named.get("nearText").foreach { nt =>
          nearTxt = Some(extractNearText(asObj(nt, "hybrid.searches.nearText"), inHybrid = true))
        }
        named.get("nearVector").foreach { nv =>
          val o = asObj(nv, "hybrid.searches.nearVector")
          val (innerTvs, _) = extractTargets(o)
          if (tvs.isEmpty && innerTvs.nonEmpty)
            fail("targetVectors need to be set in the hybrid search to be handled correctly")
          nearVec = Some(extractNearVector(o, targetsFromOuter = Some(tvs)).left.getOrElse(
            fail("hybrid: multi vectors are not supported in the nearVector sub-search")))
        }
      }
    }

    // operands: explicit weighted sub-searches (hybrid.go:33-40, 74-111)
    val subSearches = src.get("operands").map(asList(_, "hybrid.operands")).getOrElse(Nil).map { op =>
      val sub = asObj(op, "hybrid.operands")
      val weight = sub.get("weight").map(asNum(_, "hybrid.operands.weight")).getOrElse(
        fail("hybrid: operand weight is required"))
      sub.get("sparseSearch").map(ss => HybridSubSearch(weight,
          bm25 = Some(extractBm25(asObj(ss, "sparseSearch")))))
        .orElse(sub.get("nearText").map(nt => HybridSubSearch(weight,
          nearText = Some(extractNearText(asObj(nt, "nearText"), inHybrid = true)))))
        .orElse(sub.get("nearVector").map(nv => HybridSubSearch(weight,
          nearVector = Some(extractNearVector(asObj(nv, "nearVector"), Some(tvs)).left.getOrElse(
            fail("hybrid: multi vectors are not supported in the nearVector sub-search"))))))
        .getOrElse(fail(s"unknown subsearch type: ${goV(op)}"))
    }

    val alpha = src.get("alpha").map(asNum(_, "hybrid.alpha")).getOrElse(0.75)
    if (alpha < 0 || alpha > 1) fail("alpha should be between 0.0 and 1.0")

    val maxVectorDistance = src.get("maxVectorDistance").map(asNum(_, "maxVectorDistance"))

    val fusion = src.get("fusionType") match {
      case Some(GEnum("rankedFusion")) => FusionType.Ranked
      case Some(GEnum("relativeScoreFusion")) | None => FusionType.RelativeScore
      case Some(o) => fail(s"hybrid: unknown fusionType ${goV(o)}")
    }

    val vector = src.get("vector").map {
      case v @ GList(items) if items.forall(x => x.isInstanceOf[GInt] || x.isInstanceOf[GFloat]) =>
        floatList(v, "hybrid.vector")
      case o => fail(s"cannot parse vector: unrecognized vector type: ${goType(o)}")
    }

    if (nearTxt.isDefined && nearVec.isDefined)
      fail("hybrid search cannot have both nearText and nearVector parameters")
    if (vector.isDefined && nearTxt.isDefined) fail("cannot have both vector and nearTextParams")
    if (vector.isDefined && nearVec.isDefined) fail("cannot have both vector and nearVectorParams")

    // the nearVector sub-search IS the dense leg (explorer_hybrid.go routes
    // NearVectorParams into the dense search) — same folding as the gRPC path
    val denseVec = vector.orElse(nearVec.map(_.vector))
    val denseCutoff = maxVectorDistance
      .orElse(nearVec.flatMap(_.distance))
      .orElse(nearVec.flatMap(_.certainty).map(c => 2.0 * (1.0 - c)))

    Hybrid(
      query = src.get("query").map(asStr(_, "hybrid.query")).getOrElse(""),
      vector = denseVec,
      metric = Metric.Default,
      alpha = alpha,
      fusionType = fusion,
      properties = src.get("properties").map(strList(_, "hybrid.properties")).getOrElse(Nil),
      maxVectorDistance = denseCutoff,
      targetVectors = tvs,
      subSearches = subSearches,
      searchOperator = src.get("bm25SearchOperator").map(extractSearchOperator)
        .getOrElse(SearchOperator.Or(1)),
      nearText = nearTxt)
  }

  // ==========================================================================
  // Get selection set → properties / refs / _additional / module params
  // ==========================================================================

  /** GeoCoordinates / PhoneNumber sub-fields mark an OBJECT property, not a
   * cross-reference (class_builder_fields.go:616-629). */
  private def isObjectSubField(name: String): Boolean = name match {
    case "latitude" | "longitude" => true
    case "input" | "internationalFormatted" | "nationalFormatted" | "national" |
         "valid" | "countryCode" | "defaultCountry" => true
    case _ => false
  }

  private final case class SelectionDecode(
      properties: Seq[String],
      refs: Seq[String],
      additional: Set[String],
      rerank: Option[RerankParams],
      generate: Option[GenerateParams],
      summary: Option[SummaryParams],
      ner: Option[NerParams],
      featureProjection: Option[FeatureProjectionParams],
      aliases: Seq[(String, String)] = Nil,
      // ref prop → the target classes its inline fragments name (doc order,
      // deduped) — drives multi-class cref resolution scope
      refOnTypes: Map[String, Seq[String]] = Map.empty,
      // ref prop → `_additional` metadata requested inside its fragments
      refAdditional: Map[String, Set[String]] = Map.empty)

  private def decodeGetSelection(sel: List[GSel]): SelectionDecode = {
    var props = Vector.empty[String]
    var refs = Vector.empty[String]
    var additional = Set.empty[String]
    var rerank: Option[RerankParams] = None
    var generate: Option[GenerateParams] = None
    var summary: Option[SummaryParams] = None
    var ner: Option[NerParams] = None
    var fp: Option[FeatureProjectionParams] = None
    // alias → the served column it re-keys (spec §2.7; reply keys use the
    // alias). Refs resolve into `<prop>_resolved`, so that is the source.
    var aliases = Vector.empty[(String, String)]
    var refOnTypes = Map.empty[String, Seq[String]]
    var refAdditional = Map.empty[String, Set[String]]

    sel.foreach {
      case GInlineFrag(_, _) =>
        fail("graphql: inline fragments are only valid inside a reference property selection")
      case f: GField if f.name == "_additional" =>
        f.sel.foreach {
          case a: GField => a.name match {
            case "id" | "vector" | "distance" | "certainty" | "score" |
                 "explainScore" | "creationTimeUnix" | "lastUpdateTimeUnix" |
                 "group" | "classification" | "isConsistent" | "spellCheck" |
                 "interpretation" | "nearestNeighbors" | "semanticPath" =>
              additional += a.name
            case "vectors" =>
              additional += "vector"
            case "rerank" =>
              additional += "rerank"
              rerank = Some(RerankParams(
                property = a.arg("property").map(asStr(_, "rerank.property")).getOrElse(
                  fail("rerank: property is required")),
                query = a.arg("query").map(asStr(_, "rerank.query")).getOrElse("")))
            case "generate" =>
              additional += "generate"
              val single = a.arg("singleResult").map(asObj(_, "generate.singleResult"))
                .flatMap(_.get("prompt")).map(asStr(_, "generate.prompt"))
              val grouped = a.arg("groupedResult").map(asObj(_, "generate.groupedResult"))
              generate = Some(GenerateParams(
                singlePrompt = single,
                groupedTask = grouped.flatMap(_.get("task")).map(asStr(_, "generate.task")),
                groupedProperties = grouped.flatMap(_.get("properties"))
                  .map(strList(_, "generate.properties")).getOrElse(Nil)))
            case "summary" =>
              additional += "summary"
              summary = Some(SummaryParams(
                properties = a.arg("properties").map(strList(_, "summary.properties")).getOrElse(Nil)))
            case "answer" =>
              additional += "answer"
            case "tokens" =>
              additional += "tokens"
              ner = Some(NerParams(
                properties = a.arg("properties").map(strList(_, "tokens.properties")).getOrElse(Nil),
                certainty = a.arg("certainty").map(asNum(_, "tokens.certainty")),
                limit = a.arg("limit").map(asInt(_, "tokens.limit"))))
            case "featureProjection" =>
              additional += "featureProjection"
              fp = Some(FeatureProjectionParams(
                algorithm = a.arg("algorithm").map(asStr(_, "featureProjection.algorithm")).getOrElse("tsne"),
                dimensions = a.arg("dimensions").map(asInt(_, "featureProjection.dimensions")).getOrElse(2)))
            case "__typename" => ()
            case other => fail(s"graphql: unknown _additional property '$other'")
          }
          case _ => fail("graphql: _additional selections must be fields")
        }
      case f: GField if f.name == "__typename" => ()
      case f: GField =>
        if (f.sel.isEmpty) {
          props :+= f.name
          f.alias.foreach(a => aliases :+= a -> f.name)
        } else {
          // object prop (geo/phone sub-fields) vs cross-reference (inline frags)
          val isObject = f.sel.exists {
            case sub: GField => isObjectSubField(sub.name)
            case _ => false
          }
          if (isObject) {
            props :+= f.name
            f.alias.foreach(a => aliases :+= a -> f.name)
          } else {
            refs :+= f.name; props :+= f.name
            f.alias.foreach(a => aliases :+= a -> s"${f.name}_resolved")
            // the fragment type conditions scope which target classes a
            // multi-class cref resolves (multi_reftype_bug_test.go)
            val onTypes = f.sel.collect { case GInlineFrag(t, _) => t }.distinct
            if (onTypes.nonEmpty) refOnTypes += f.name -> onTypes
            // `_additional` metadata on the TARGET objects (the "in
            // reference" arms of local_get_with_additional_test.go) — the
            // supported subset; other fragment fields are the target's
            // regular properties, already resolved wholesale
            val refAdd = f.sel.flatMap {
              case GInlineFrag(_, fsel) => fsel.collect {
                case a: GField if a.name == "_additional" => a.sel.collect {
                  case s: GField if Set("id", "vector", "creationTimeUnix",
                    "lastUpdateTimeUnix").contains(s.name) => s.name
                }
              }.flatten
              case _ => Nil
            }.toSet
            if (refAdd.nonEmpty) refAdditional += f.name -> refAdd
          }
        }
    }
    SelectionDecode(props, refs, additional, rerank, generate, summary, ner, fp,
      aliases, refOnTypes, refAdditional)
  }

  // ==========================================================================
  // Get
  // ==========================================================================

  /** Legacy `group` argument (class_builder_fields.go:549-562). The engine
   * serves it through [[graft.operators.MergeGrouper]], which operates on
   * the result page, so it travels NEXT TO GetParams. */
  final case class GqlGroup(strategy: String, force: Double)

  final case class GqlGet(params: GetParams, group: Option[GqlGroup],
      aliases: Seq[(String, String)] = Nil)

  /** Decode a Get document into GetParams. The legacy `group` argument maps
   * onto the page-level MergeGrouper operator, which GetParams cannot carry
   * — use [[getFull]] for documents that set it; silently serving the
   * ungrouped page would diverge from the reference. */
  def get(g: Graft, doc: String): GetParams = get(g, doc, "")

  /** `variables` is the request's variables member as a JSON object string
   * (the reference hands it to execution as VariableValues,
   * adapters/handlers/graphql/schema.go:81); "" = none. */
  def get(g: Graft, doc: String, variables: String): GetParams = {
    val full = getFull(g, doc, variables)
    if (full.group.isDefined)
      fail("graphql: the legacy 'group' argument needs GraphQL.getFull - " +
        "the grouping runs over the served page (operators/MergeGrouper)")
    full.params
  }

  def getFull(g: Graft, doc: String): GqlGet = getFull(g, doc, "")

  def getFull(g: Graft, doc: String, variables: String): GqlGet = {
    val (name, classField) = rootField(doc, variables)
    if (name != "Get") fail(s"graphql: expected a Get query, got '$name'")
    decodeGetClass(g, classField)
  }

  /** POST /v1/graphql/batch (models.GraphQLQueries — a JSON array of
   * {operationName, query, variables}) answered PER QUERY IN ORDER
   * (batch_request_endpoints/graphql_test.go pins the ordering by matching
   * each slot's error to its own query text). A non-object `variables`
   * payload is the handler's 422 with Go's %v rendering of the received
   * value; per-query failures carry their error text, successes the served
   * page (Get and Aggregate documents dispatch on the top-level field). */
  def batchWire(g: Graft, json: String): Seq[Either[String, org.apache.spark.sql.DataFrame]] = {
    import org.json4s.jackson.JsonMethods
    def goJson(v: JValue): String = v match {
      case JArray(xs) => xs.map(goJson).mkString("[", " ", "]")
      case JObject(fs) => fs.sortBy(_._1).map { case (k, x) => s"$k:${goJson(x)}" }
        .mkString("map[", " ", "]")
      case JInt(i) => i.toString
      case JLong(l) => l.toString
      case JDouble(d) => WireDecoder.goFloat(d)
      case JString(s) => s
      case JBool(b) => b.toString
      case JNull | JNothing => "<nil>"
      case other => other.toString
    }
    val items = JsonMethods.parse(json) match {
      case JArray(xs) => xs
      case o => fail(s"graphql batch: expected a list, got ${JsonMethods.compact(JsonMethods.render(o))}")
    }
    items.map { q =>
      try {
        val varsJv = q \ "variables"
        varsJv match {
          case JNothing | JNull | _: JObject => ()
          case other =>
            // handlers reject non-map variables BEFORE parsing the document
            fail(s"422: expected map[string]interface{}, received ${goJson(other)}")
        }
        val doc = (q \ "query") match {
          case JString(s) => s
          case _ => fail("graphql batch: query is required")
        }
        val vars = varsJv match {
          case o: JObject => JsonMethods.compact(JsonMethods.render(o))
          case _ => ""
        }
        rootField(doc, vars)._1 match {
          case "Get" => Right(g.get(get(g, doc, vars)))
          case "Aggregate" => Right(g.aggregate(aggregate(g, doc, vars)))
          case other => fail(s"graphql batch: unsupported top-level field '$other'")
        }
      } catch { case e: Throwable => Left(e.getMessage) }
    }
  }

  /** The variables JSON object → name-keyed GraphQL values. */
  private def parseVariables(variables: String): Map[String, GVal] =
    if (variables == null || variables.trim.isEmpty) Map.empty
    else org.json4s.jackson.JsonMethods.parse(variables) match {
      case JObject(fields) => fields.map { case (k, v) => k -> jsonToGVal(v) }.toMap
      case other => fail(s"graphql: variables must be a JSON object, got $other")
    }

  private def jsonToGVal(j: JValue): GVal = j match {
    case JInt(x) => GInt(x.toLong)
    case JLong(x) => GInt(x)
    case JDouble(x) => GFloat(x)
    case JDecimal(x) => GFloat(x.toDouble)
    case JString(x) => GStr(x)
    case JBool(x) => GBool(x)
    case JNull | JNothing => GNull
    case JArray(xs) => GList(xs.map(jsonToGVal))
    case o: JObject => GObj(o.obj.map { case (k, v) => k -> jsonToGVal(v) })
    case other => fail(s"graphql: unsupported variable value $other")
  }

  /** Re-key alias'd selections on a served page: each alias column aliases
   * its field's output (duplicates fine — two aliases can select the same
   * property, which a plain rename could not express). */
  def applyAliases(df: org.apache.spark.sql.DataFrame,
                   aliases: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
    aliases.foldLeft(df) { case (d, (a, src)) =>
      d.withColumn(a, org.apache.spark.sql.functions.col(src)) }

  private def rootField(doc: String, variables: String = ""): (String, GField) = {
    val root = new Parser(doc, parseVariables(variables)).document()
    root match {
      case List(top: GField) =>
        top.sel match {
          case List(cls: GField) => (top.name, cls)
          case Nil => fail(s"graphql: '${top.name}' needs a class selection")
          case _ => fail(s"graphql: exactly one class field expected under '${top.name}'")
        }
      case _ => fail("graphql: exactly one top-level field expected (Get | Aggregate | Explore)")
    }
  }

  private def decodeGetClass(g: Graft, cls: GField): GqlGet = {
    val collection = cls.name
    // unknown collection errors first, with the graphql-go schema text the
    // reference surfaces for an unregistered class (the generated Get schema
    // simply has no such field — local_get_with_sort_test.go:1188)
    try g.collection(collection) catch {
      case _: Exception =>
        fail(s"""Cannot query field "$collection" on type "GetObjectsObj".""")
    }

    val tenant = cls.arg("tenant").map(asStr(_, "tenant"))
    val where = cls.arg("where").map(decodeWhere(g, collection, _))

    // bare-object sort and bare-string paths coerce per GraphQL list-input
    // coercion (the acceptance cursor test sends `sort: {path: "name"}`)
    val sort = cls.arg("sort").map {
      case o: GObj => List(o: GVal)
      case other => asList(other, "sort")
    }.getOrElse(Nil).map { s =>
      val o = asObj(s, "sort")
      SortBy(
        path = o.get("path") match {
          case Some(GStr(p)) => Seq(p)
          case Some(other) => strList(other, "sort.path")
          case None => Nil
        },
        desc = o.get("order").exists { case GEnum("desc") | GStr("desc") => true; case _ => false })
    }

    val nearVectorLeg = cls.arg("nearVector").map { nv =>
      try extractNearVector(asObj(nv, "nearVector"), targetsFromOuter = None)
      catch { case e: WireError => fail(s"failed to extract nearVector params: ${e.getMessage}") }
    }
    val nearObject = cls.arg("nearObject").map { no =>
      try extractNearObject(asObj(no, "nearObject"))
      catch { case e: WireError => fail(s"failed to extract nearObject params: ${e.getMessage}") }
    }
    // nearText (and nearMedia) errors stay UNWRAPPED by design: in the
    // reference these are module-provided arguments routed through
    // modulesProvider.ExtractSearchParams (class_builder_fields.go:421-431),
    // which has no error return — only nearVector/nearObject/hybrid carry
    // resolveGet's "failed to extract ... params:" wrap
    val nearText = cls.arg("nearText").map(nt =>
      extractNearText(asObj(nt, "nearText"), inHybrid = false))
    val nearMedia = Seq(
      ("nearImage", MediaKind.Image, "image"), ("nearAudio", MediaKind.Audio, "audio"),
      ("nearVideo", MediaKind.Video, "video"), ("nearDepth", MediaKind.Depth, "depth"),
      ("nearThermal", MediaKind.Thermal, "thermal"), ("nearIMU", MediaKind.Imu, "imu"))
      .flatMap { case (argName, kind, payloadField) =>
        cls.arg(argName).map { nm =>
          val o = asObj(nm, argName)
          val payload = o.get(payloadField).map(asStr(_, payloadField)).getOrElse(
            fail(s"$argName: $payloadField is a required field"))
          val (dist, cert) = distCert(o, argName)
          val (tvs, _) = extractTargets(o)
          NearMedia(kind, java.util.Base64.getDecoder.decode(payload),
            metric = Metric.Default, distance = dist, certainty = cert, targetVectors = tvs)
        }
      }.headOption

    val bm25 = cls.arg("bm25").map { b =>
      if (sort.nonEmpty) fail("bm25 search is not compatible with sort")
      extractBm25(asObj(b, "bm25"))
    }
    val hybrid = cls.arg("hybrid").map { h =>
      if (sort.nonEmpty) fail("hybrid search is not compatible with sort")
      try extractHybrid(asObj(h, "hybrid"))
      catch { case e: WireError => fail(s"failed to extract hybrid params: ${e.getMessage}") }
    }

    val ask = cls.arg("ask").map { a =>
      val o = asObj(a, "ask")
      AskParams(
        question = o.get("question").map(asStr(_, "ask.question")).getOrElse(
          fail("ask: question is a required field")),
        properties = o.get("properties").map(strList(_, "ask.properties")).getOrElse(Nil))
    }

    val group = cls.arg("group").map { grp =>
      val o = asObj(grp, "group")
      GqlGroup(
        strategy = o.get("type") match {
          case Some(GEnum(t @ ("closest" | "merge"))) => t
          case other => fail(s"group: unknown type ${other.map(goV).getOrElse("<nil>")}")
        },
        force = o.get("force").map(asNum(_, "group.force")).getOrElse(
          fail("group: force is a required field")))
    }

    val groupBy = cls.arg("groupBy").map { gb =>
      val o = asObj(gb, "groupBy")
      val path = o.get("path").map(strList(_, "groupBy.path")).getOrElse(Nil)
      // ExtractGroupBy (common_filters/group_by.go:21-26) silently keeps an
      // EMPTY property for a multi-segment path; the engine errors loudly
      // instead of grouping on nothing
      if (path.size != 1)
        fail(s"groupBy: path can only have one entry, got ${path.mkString("[", " ", "]")}")
      GroupByParams(path.head,
        groups = o.get("groups").map(asInt(_, "groupBy.groups")).getOrElse(0),
        objectsPerGroup = o.get("objectsPerGroup").map(asInt(_, "groupBy.objectsPerGroup")).getOrElse(0))
    }

    // pagination (entities/filters/pagination.go: absent limit = flag-not-set;
    // the GraphQL default is QueryDefaults.LimitGraphQL = 100
    // (config_handler.go:888 DefaultQueryDefaultsLimitGraphQL) — the
    // batch-endpoints acceptance verify reads 20 rows with no limit; the
    // REST/gRPC transports keep their own default 10 (WireDecoder.decodeSearch)
    val offset = cls.arg("offset").map(asInt(_, "offset")).getOrElse(0)
    val limitArg = cls.arg("limit").map(asInt(_, "limit")).filter(_ > 0)
    // LimitFlagSearchByDist (entities/filters/pagination.go + db/search.go:
    // 57-59): a nearX leg with a distance/certainty threshold and NO
    // positive limit runs UNLIMITED — the radius bounds the page, not the
    // default limit (local_get_with_unlimited_vector_search_test.go reads
    // >100 notes with no limit and with limit: -1)
    val nearThreshold =
      nearVectorLeg.flatMap(_.left.toOption).exists(nv => nv.distance.orElse(nv.certainty).isDefined) ||
      nearObject.exists(no => no.distance.orElse(no.certainty).isDefined) ||
      nearText.exists(nt => nt.distance.orElse(nt.certainty).isDefined)
    val limit = limitArg.getOrElse(100)
    val autocut = cls.arg("autocut").map(asInt(_, "autocut")).filter(_ > 0)
    // `after` opens the cursor api even when EMPTY (the from-the-start walk,
    // local_get_cursor_test.go); a cursor without an explicit limit carries
    // the unset flag (-1) so the engine raises the reference's
    // "limit parameter must be set"
    val after = cls.arg("after").map(asStr(_, "after")).map(a =>
      Cursor(Some(idValue(a)).filter(_ != ""),
        cls.arg("limit").map(asInt(_, "limit")).getOrElse(-1)))

    val sd = decodeGetSelection(flattenSelfFrags(collection, cls.sel))

    val params = GetParams(
      collection = collection,
      where = where,
      nearVector = nearVectorLeg.flatMap(_.left.toOption),
      nearMultiVector = nearVectorLeg.flatMap(_.toOption),
      nearObject = nearObject,
      nearText = nearText,
      nearMedia = nearMedia,
      bm25 = bm25,
      hybrid = hybrid,
      sort = sort,
      pagination =
        if (limitArg.isEmpty && offset == 0 && nearThreshold && after.isEmpty) None
        else Some(Pagination(offset = offset, limit = limit)),
      cursor = after,
      groupBy = groupBy,
      properties = sd.properties,
      additional = sd.additional,
      resolveRefs = sd.refs,
      refTargetClasses = sd.refOnTypes,
      refAdditional = sd.refAdditional,
      tenant = tenant,
      autocut = autocut,
      rerank = sd.rerank,
      generate = sd.generate,
      summary = sd.summary,
      ask = ask,
      ner = sd.ner,
      featureProjection = sd.featureProjection)
    GqlGet(params, group, sd.aliases)
  }

  // ==========================================================================
  // Explore (cross-class kNN; local/explore/concepts_resolver.go:81-132)
  // ==========================================================================

  /** Decoded `{ Explore(...) { beacon className distance certainty } }`
   * arguments. The reference probes every class; this engine's explore()
   * takes the collection list explicitly, so the decode result carries the
   * search legs and paging for the caller to fan out. */
  final case class GqlExplore(
      nearText: Option[NearText],
      nearVector: Option[NearVector],
      nearObject: Option[NearObject],
      limit: Int,
      offset: Int,
      withCertainty: Boolean)

  def explore(doc: String): GqlExplore = {
    val root = new Parser(doc).document()
    val f = root match {
      case List(top: GField) if top.name == "Explore" => top
      case List(top: GField) => fail(s"graphql: expected an Explore query, got '${top.name}'")
      case _ => fail("graphql: exactly one top-level field expected (Get | Aggregate | Explore)")
    }
    val nearVector = f.arg("nearVector").map { nv =>
      try extractNearVector(asObj(nv, "nearVector"), targetsFromOuter = None).left.getOrElse(
        fail("multi vectors are not supported for explore"))
      catch { case e: WireError => fail(s"failed to extract nearVector params: ${e.getMessage}") }
    }
    val nearObject = f.arg("nearObject").map { no =>
      try extractNearObject(asObj(no, "nearObject"))
      catch { case e: WireError => fail(s"failed to extract nearObject params: ${e.getMessage}") }
    }
    val nearText = f.arg("nearText").map(nt =>
      extractNearText(asObj(nt, "nearText"), inHybrid = false))
    // certainty is requested through the SELECTION, not an argument
    // (containsCertaintyProperty, concepts_resolver.go:135-149)
    val withCertainty = f.sel.exists {
      case s: GField => s.name == "certainty"
      case _ => false
    }
    GqlExplore(
      nearText = nearText, nearVector = nearVector, nearObject = nearObject,
      limit = f.arg("limit").map(asInt(_, "limit")).getOrElse(0),
      offset = f.arg("offset").map(asInt(_, "offset")).getOrElse(0),
      withCertainty = withCertainty)
  }

  // ==========================================================================
  // Aggregate
  // ==========================================================================

  def aggregate(g: Graft, doc: String): AggregateParams = aggregate(g, doc, "")

  def aggregate(g: Graft, doc: String, variables: String): AggregateParams =
    aggregateFull(g, doc, variables).params

  /** Aggregate params plus the alias → output-column renames of alias'd
   * prop selections (expanded per aggregator: `alias_count` ← `prop_count`),
   * applied to the served frame with [[applyAliases]]. */
  final case class GqlAggregate(params: AggregateParams, aliases: Seq[(String, String)])

  def aggregateFull(g: Graft, doc: String, variables: String = ""): GqlAggregate = {
    val (name, classField) = rootField(doc, variables)
    if (name != "Aggregate") fail(s"graphql: expected an Aggregate query, got '$name'")
    decodeAggregateClass(g, classField)
  }

  private def decodeAggregateClass(g: Graft, cls: GField): GqlAggregate = {
    val collection = cls.name
    g.collection(collection)

    val tenant = cls.arg("tenant").map(asStr(_, "tenant"))
    val where = cls.arg("where").map(decodeWhere(g, collection, _))

    // groupBy: a filters.ParsePath list (resolver.go:265-279, path.go:78-150);
    // a bare string coerces to the single-element list (GraphQL list-input
    // coercion — the acceptance date aggregations send `groupBy: "unique"`)
    val groupBy = cls.arg("groupBy").map {
      case s: GStr => GList(List(s))
      case other => other
    }.map {
      case GList(items) =>
        // the not-a-list text only fires for a NON-list argument; a list
        // with non-string elements keeps its own element error
        val path = items.map {
          case GStr(s) => s
          case o => fail(s"could not extract groupBy path: path segment must be a string, got ${goV(o)}")
        }
        if (path.size % 2 == 0)
          // rootClass is prepended, so an EVEN user path runs off the end
          fail(s"could not extract groupBy path: missing an argument after '${path.last}'")
        path
      case other =>
        fail(s"could not extract groupBy path: no groupBy must be a list, instead got: ${goV(other)}")
    }

    val nearVec = cls.arg("nearVector").map { nv =>
      try extractNearVector(asObj(nv, "nearVector"), targetsFromOuter = None) match {
        case Left(v) => v
        case Right(_) => fail("multi vector is not supported for aggregation")
      } catch { case e: WireError => fail(s"failed to extract nearVector params: ${e.getMessage}") }
    }
    val nearObject = cls.arg("nearObject").map { no =>
      try extractNearObject(asObj(no, "nearObject"))
      catch { case e: WireError => fail(s"failed to extract nearObject params: ${e.getMessage}") }
    }
    val nearText = cls.arg("nearText").map(nt =>
      extractNearText(asObj(nt, "nearText"), inHybrid = false))
    val hybrid = cls.arg("hybrid").map { h =>
      try extractHybrid(asObj(h, "hybrid"))
      catch { case e: WireError => fail(s"failed to extract hybrid params: ${e.getMessage}") }
    }

    val objectLimit = cls.arg("objectLimit").map(asInt(_, "objectLimit"))
    objectLimit.foreach { ol =>
      if (ol <= 0) fail("objectLimit must be a positive integer")
    }
    if (objectLimit.isDefined &&
        nearVec.isEmpty && nearObject.isEmpty && nearText.isEmpty && hybrid.isEmpty)
      fail("objectLimit can only be used with a near<Media> or hybrid filter")

    val limit = cls.arg("limit").map(asInt(_, "limit"))

    // selection set → aggregators (resolver.go:196-262)
    var includeMeta = false
    var props = Map.empty[String, Seq[Aggregator]]
    var aliases = Vector.empty[(String, String)]
    flattenSelfFrags(collection, cls.sel).foreach {
      case f: GField if f.name == "groupedBy" || f.name == "__typename" => ()
      case f: GField if f.name == "meta" => includeMeta = true
      case f: GField =>
        // first-letter lowercasing quirk (resolver.go:222)
        val prop = f.name.head.toLower + f.name.tail
        val aggs = f.sel.collect { case a: GField => a }.filter(_.name != "__typename").map { a =>
          try parseAggregator(a)
          catch { case e: WireError =>
            fail(s"could not extract properties for class '$collection': ${e.getMessage}") }
        }
        // an alias'd prop selection MERGES aggregators with the plain one
        // (the served columns stay prop-keyed) and re-keys its own per-agg
        // output columns under the alias
        f.alias.foreach(a => aliases ++= aggs.map(ag => s"${a}_${ag.name}" -> s"${prop}_${ag.name}"))
        props += prop -> (props.getOrElse(prop, Nil) ++ aggs).distinct
      case _ => fail("graphql: Aggregate selections must be fields")
    }

    GqlAggregate(AggregateParams(
      collection = collection,
      groupBy = groupBy,
      properties = props,
      includeMetaCount = includeMeta,
      where = where,
      nearVector = nearVec,
      nearObject = nearObject,
      nearText = nearText,
      hybrid = hybrid,
      objectLimit = objectLimit,
      limit = limit,
      tenant = tenant), aliases)
  }

  /** entities/aggregation/params.go ParseAggregatorProp; topOccurrences
   * defaults to limit 5 and takes a GraphQL `limit` argument override
   * (resolver.go:251-257). */
  private def parseAggregator(f: GField): Aggregator = {
    import Aggregator._
    f.name match {
      case "count" => Count
      case "type" => Type
      case "mean" => Mean
      case "median" => Median
      case "mode" => Mode
      case "maximum" => Maximum
      case "minimum" => Minimum
      case "sum" => Sum
      case "totalTrue" => TotalTrue
      case "totalFalse" => TotalFalse
      case "percentageTrue" => PercentageTrue
      case "percentageFalse" => PercentageFalse
      case "pointingTo" => PointingTo
      case "topOccurrences" =>
        TopOccurrences(f.arg("limit").map(asInt(_, "topOccurrences.limit")).getOrElse(5))
      case other => fail(s"unrecognized aggregator prop '$other'")
    }
  }
}
