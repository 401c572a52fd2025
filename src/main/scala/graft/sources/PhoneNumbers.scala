package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * phoneNumber property normalization — the reference parses every
 * phoneNumber value on the write path into {input, defaultCountry,
 * countryCode, national, nationalFormatted, internationalFormatted, valid}
 * (usecases/objects/validation/phone_numbers.go:24-46, backed by
 * libphonenumber): international-format input parses standalone; national
 * format requires the value's ISO 3166-1 alpha-2 `defaultCountry`.
 *
 * The full libphonenumber metadata set is a dependency the environment
 * doesn't ship, so the parser here is a DETERMINISTIC SIMPLIFIED MODEL with
 * the reference's struct shape and decision rules: a fixed calling-code
 * table, longest-prefix country-code detection on `+`-prefixed input,
 * defaultCountry lookup for national input (missing/unknown → invalid, the
 * reference's "invalid or missing defaultCountry" case), and a length-range
 * validity check standing in for per-region number patterns. Pure codegen'd
 * column expressions — the when-chain is bounded by the code table.
 */
object PhoneNumbers {

  /** ISO 3166-1 alpha-2 → calling code (the stand-in's metadata table). */
  val CountryCodes: Map[String, Int] = Map(
    "US" -> 1, "CA" -> 1, "RU" -> 7, "FR" -> 33, "ES" -> 34, "GB" -> 44,
    "DE" -> 49, "BR" -> 55, "IN" -> 91, "CN" -> 86, "JP" -> 81, "NL" -> 31)

  /** Normalize (input string, defaultCountry string) into the reference's
   * phoneNumber struct. */
  def normalize(input: Column, defaultCountry: Column): Column = {
    val trimmed = trim(input)
    val hasPlus = trimmed.startsWith("+")
    val digits = regexp_replace(trimmed, "[^0-9]", "")
    // international: longest-prefix match over the known calling codes
    val noMatch = struct(lit(null).cast("int").as("cc"),
      lit(null).cast("string").as("nat"))
    val codesByLenDesc = CountryCodes.values.toSeq.distinct
      .sortBy(c => (-c.toString.length, c))
    val intl = codesByLenDesc.foldRight(noMatch) { (c, acc) =>
      when(digits.startsWith(c.toString),
        struct(lit(c).as("cc"),
          digits.substr(lit(c.toString.length + 1), lit(20)).as("nat")))
        .otherwise(acc)
    }
    // national: the value's defaultCountry resolves the calling code
    val country = upper(coalesce(defaultCountry, lit("")))
    val natCc = CountryCodes.toSeq.sortBy(_._1).foldRight(lit(null).cast("int")) {
      case ((iso, c), acc) => when(country === iso, lit(c)).otherwise(acc)
    }
    val cc = when(hasPlus, intl.getField("cc")).otherwise(natCc)
    val nat = when(hasPlus, intl.getField("nat")).otherwise(digits)
    val valid = cc.isNotNull && length(nat).between(4, 14)
    struct(
      input.as("input"),
      country.as("defaultCountry"),
      cc.cast("long").as("countryCode"),
      when(valid, nat.cast("long")).as("national"),
      when(valid, nat).as("nationalFormatted"),
      when(valid, concat(lit("+"), cc.cast("string"), lit(" "), nat))
        .as("internationalFormatted"),
      valid.as("valid"))
  }
}
