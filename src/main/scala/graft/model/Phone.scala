package graft.model

/**
 * phoneNumber property parsing — the reference validates raw phone input on
 * write and stores the parsed struct (usecases/objects/validation/
 * phone_numbers.go:26-44, backed by the libphonenumber port; the stored
 * shape is entities/models/phone_number.go: input / internationalFormatted /
 * nationalFormatted / national / countryCode / defaultCountry / valid).
 *
 * This engine keeps the same struct columns but parses with a small
 * deterministic E.164 reader instead of the full libphonenumber metadata
 * set (country dial-code table + "digits after the prefix are the national
 * number"). That covers `+<cc><national>` inputs exactly the way the
 * reference's test corpus uses them; regional formatting rules (grouping,
 * trunk prefixes) are metadata the container doesn't carry, so
 * `internationalFormatted` is rendered as `+<cc> <national>` — which is
 * also what libphonenumber prints for numbers it has no grouping pattern
 * for (the reference's own acceptance fixtures assert exactly this shape,
 * test/acceptance/graphql_resolvers/local_get_with_filter_test.go:204-210).
 */
object Phone {

  /** Parsed phone value; field names match the reference's JSON shape. */
  final case class Parsed(
      input: String,
      internationalFormatted: String,
      countryCode: Long,
      national: Long,
      nationalFormatted: String,
      valid: Boolean,
      defaultCountry: String)

  /** ITU E.164 country calling codes (public assignment list), longest
   * match first; enough to resolve any 1-3 digit prefix deterministically. */
  private val dialCodes: Set[Int] = Set(
    1, 7, 20, 27, 30, 31, 32, 33, 34, 36, 39, 40, 41, 43, 44, 45, 46, 47,
    48, 49, 51, 52, 53, 54, 55, 56, 57, 58, 60, 61, 62, 63, 64, 65, 66,
    81, 82, 84, 86, 90, 91, 92, 93, 94, 95, 98,
    211, 212, 213, 216, 218, 220, 221, 222, 223, 224, 225, 226, 227, 228,
    229, 230, 231, 232, 233, 234, 235, 236, 237, 238, 239, 240, 241, 242,
    243, 244, 245, 246, 248, 249, 250, 251, 252, 253, 254, 255, 256, 257,
    258, 260, 261, 262, 263, 264, 265, 266, 267, 268, 269, 290, 291, 297,
    298, 299, 350, 351, 352, 353, 354, 355, 356, 357, 358, 359, 370, 371,
    372, 373, 374, 375, 376, 377, 378, 380, 381, 382, 383, 385, 386, 387,
    389, 420, 421, 423, 500, 501, 502, 503, 504, 505, 506, 507, 508, 509,
    590, 591, 592, 593, 594, 595, 596, 597, 598, 599, 670, 672, 673, 674,
    675, 676, 677, 678, 679, 680, 681, 682, 683, 685, 686, 687, 688, 689,
    690, 691, 692, 850, 852, 853, 855, 856, 880, 886, 960, 961, 962, 963,
    964, 965, 966, 967, 968, 970, 971, 972, 973, 974, 975, 976, 977, 992,
    993, 994, 995, 996, 998)

  /** Default-country alpha-2 → dial code (the subset a `defaultCountry`
   * input can carry; extend as needed — unknown codes parse as invalid,
   * mirroring phonenumbers.ErrInvalidCountryCode). */
  private val countryToDial: Map[String, Int] = Map(
    "US" -> 1, "CA" -> 1, "NL" -> 31, "BE" -> 32, "FR" -> 33, "ES" -> 34,
    "IT" -> 39, "GB" -> 44, "DE" -> 49, "AU" -> 61, "JP" -> 81, "KR" -> 82,
    "CN" -> 86, "IN" -> 91, "BR" -> 55, "CH" -> 41, "AT" -> 43, "SE" -> 46,
    "NO" -> 47, "DK" -> 45, "FI" -> 358, "PL" -> 48, "PT" -> 351)

  /** Parse a raw input (international `+<cc>…` or national with
   * `defaultCountry`). Returns the parsed struct; `valid=false` with
   * zeroed numerics when the input can't be resolved — the reference
   * stores invalid numbers rather than failing the write when the
   * number merely fails validation. */
  def parse(input: String, defaultCountry: String = ""): Parsed = {
    val digitsOf: String => String = _.filter(_.isDigit)
    def invalid = Parsed(input, "", 0L, 0L, "", valid = false, defaultCountry)

    val trimmed = input.trim
    if (trimmed.startsWith("+")) {
      val digits = digitsOf(trimmed)
      // longest dial-code match (3 → 2 → 1 digits)
      val cc = (3 to 1 by -1).map(n => digits.take(n))
        .find(p => p.nonEmpty && dialCodes.contains(p.toInt))
      cc match {
        case Some(p) if digits.length > p.length =>
          val national = digits.drop(p.length)
          Parsed(input, s"+$p $national", p.toLong, national.toLong, national,
            valid = true, defaultCountry)
        case _ => invalid
      }
    } else if (defaultCountry.nonEmpty) {
      countryToDial.get(defaultCountry) match {
        case Some(ccNum) =>
          // national input: strip a single leading trunk '0' (the common
          // open-dial-plan rule libphonenumber applies for these regions)
          val digits = digitsOf(trimmed).dropWhile(_ == '0')
          if (digits.isEmpty) invalid
          else Parsed(input, s"+$ccNum $digits", ccNum.toLong, digits.toLong,
            digits, valid = true, defaultCountry)
        case None => invalid
      }
    } else invalid
  }
}
