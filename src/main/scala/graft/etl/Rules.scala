package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's business rules re-expressed as pure Column algebra.
  *
  * Every rule is a deterministic, null-safe `Column` expression — no UDFs —
  * so the whole rule set stays inside WholeStageCodegen and distributes
  * trivially: rules are map-stage-only, zero shuffles at any scale.
  *
  * Reference semantics: /root/reference/rules/base.py, quantity.py,
  * price.py, item.py, invoice.py.
  */
object Rules {

  /** Safe numeric read: garbage/null → default (rules/base.py:31 `_num`). */
  def safeNum(c: Column, default: Double = 0.0): Column =
    coalesce(c.try_cast("double"), lit(default))

  /** Safe text read: trimmed + uppercased, null → "" (rules/base.py:39 `_text`). */
  def safeText(c: Column): Column = upper(trim(coalesce(c.cast("string"), lit(""))))

  val BEER = "BEER"; val WINE = "WINE"; val SPIRITS = "SPIRITS"
  val NON_ALC = "NON-ALCOHOLIC"; val MISC = "MISCELLANEOUS"

  /** Ordered-contains product categorization (rules/base.py:46).
    * GL code drives the class; Product Class can demote NONALCOHOL to MISC.
    */
  def categorize(glCode: Column, productClass: Column): Column = {
    val gl = safeText(glCode); val pc = safeText(productClass)
    when(gl.contains(BEER), BEER)
      .when(gl.contains(WINE), WINE)
      .when(gl.contains("SPIRIT"), SPIRITS)
      .when(gl.contains("NONALCOHOL"), when(pc.contains(MISC), MISC).otherwise(NON_ALC))
      .otherwise(MISC)
  }

  /** Unit-of-measure normalization (rules/base.py:78). Ordered contains /
    * equality tests on the lowercased raw unit; unknown → "unit". */
  def normalizeUom(uomRaw: Column): Column = {
    val u = lower(trim(coalesce(uomRaw.cast("string"), lit(""))))
    when(u === "" || u === "nan", "unit")
      .when(u.contains("oz"), "oz")
      .when(u.contains("ct") || u.contains("count"), "ct")
      .when(u.contains("pack"), "pack")
      .when(u === "ca" || u.contains("case"), "case")
      .when(u === "bo" || u.contains("bottle"), "bottle")
      .when(u === "ea" || u.contains("each"), "each")
      .otherwise("unit")
  }

  /** Packs-per-case / units-per-pack: numeric default 1, and explicit 0 → 1
    * (rules/quantity.py:101 `int(self._num(row,...,1) or 1)`). Truncating
    * int conversion via FLOOR (positive domain) — NOT a plain cast, which
    * rounds in some engines. */
  def packsLike(c: Column): Column = {
    val n = safeNum(c, 1.0)
    when(n === 0.0, lit(1L)).otherwise(floor(n))
  }

  /** Category-routed quantity calculation (rules/quantity.py:20).
    *  - bottle UOM → raw quantity passthrough
    *  - BEER with packs ∈ {4,6,12,24} → qty × packs × units
    *  - WINE → qty × packs × units
    *  - everything else → qty × packs
    * Truncating int conversion mirrors Python `int(...)` on the positive
    * domain.
    */
  def quantity(qtyRaw: Column, uomNorm: Column, category: Column,
               packs: Column, units: Column): Column = {
    val q = safeNum(qtyRaw)
    val beerSpecial = packs.isin(4L, 6L, 12L, 24L)
    when(uomNorm === "bottle", floor(q))
      .when(category === BEER && beerSpecial, floor(q * packs * units))
      .when(category === BEER, floor(q * packs))
      .when(category === WINE, floor(q * packs * units))
      .otherwise(floor(q * packs))
      .cast("bigint")
  }

  /** Zero-pad a UPC to 14 digits and truncate to 14 (rules/item.py:17).
    * Empty / null / literal "nan"/"None" → null. */
  def formatUpc(c: Column): Column = {
    val s = trim(coalesce(c.cast("string"), lit("")))
    when(s === "" || s === "nan" || s === "None", lit(null: String))
      .otherwise(substring(lpad(s, 14, "0"), 1, 14))
  }

  /** UPC priority extraction: Pack UPC → Clean UPC → Case UPC (rules/item.py:17). */
  def extractUpc(packUpc: Column, cleanUpc: Column, caseUpc: Column): Column =
    coalesce(formatUpc(packUpc), formatUpc(cleanUpc), formatUpc(caseUpc))

  /** SKU = formatted Case UPC (rules/item.py:31). */
  def formatSku(caseUpc: Column): Column = formatUpc(caseUpc)

  /** UPC validity: all digits, at most 14 of them (rules/item.py:67).
    * Null/empty → false. Int (0/1), not boolean — see §4 oracle rules. */
  def validateUpc(c: Column): Column = {
    val s = trim(coalesce(c.cast("string"), lit("")))
    (s.rlike("^[0-9]+$") && length(s) <= 14).cast("int")
  }

  /** Deterministic fallback date. The reference falls back to `date.today()`
    * (rules/base.py:62) — wall-clock nondeterminism is a defect at scale
    * (re-running a partition must not change results), so the engine pins
    * the fallback. */
  val FallbackDate = "1970-01-01"

  /** Parse `m/d/Y` invoice dates with deterministic fallback (rules/base.py:62). */
  def parseInvoiceDate(s: Column): Column =
    coalesce(try_to_timestamp(s, lit("M/d/yyyy")).cast("date"),
             lit(FallbackDate).cast("date"))

  /** Render a money amount for notes: fixed 4-decimal form, identical across
    * engines (the reference interpolates Python float repr; we pin a stable
    * textual form that never hits a rounding tie for cents-derived values). */
  private def money(c: Column): Column = c.cast("decimal(18,4)").cast("string")

  /** Notes assembly from nonzero adjustments (stream/processor.py:141
    * `_extract_notes`): "; "-joined `Label: value` fragments, null when all
    * adjustments are zero. concat_ws drops null fragments, mirroring the
    * reference's conditional appends. */
  def notes(discount: Column, deposit: Column, misc: Column, delivery: Column): Column = {
    def frag(label: String, c: Column): Column =
      when(safeNum(c) =!= 0.0, concat(lit(label + ": "), money(c)))
    val joined = concat_ws("; ",
      frag("Discount", discount), frag("Deposit", deposit),
      frag("Misc", misc), frag("Delivery", delivery))
    when(joined === "", lit(null: String)).otherwise(joined)
  }

  /** Deterministic document id (stream/processor.py:27). The reference uses
    * `fnt-{gmail_id}-{invoice}-{wall_clock_ts}`; the engine derives the
    * trailing component from content (md5 of the source id) so ids are
    * stable under retries/replays — a requirement for exactly-once sinks. */
  def documentId(sourceId: Column, invoiceNumber: Column): Column =
    concat_ws("-", lit("fnt"),
      substring(md5(sourceId.cast("string")), 1, 16),
      invoiceNumber.cast("string"))
}
