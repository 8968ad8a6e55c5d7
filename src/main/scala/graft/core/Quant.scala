package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's ONE quantized-log convention: natural log snapped to the
  * 2^20 grid as a long, `floor(ln(x)·2^20 + 0.5)`. Every operator whose
  * oracle-exactness rests on summing log terms in integer arithmetic
  * (Kleinberg burst costs, entropy rate, KL mix drift, Hill tail index,
  * mutual information, Zipf/Heaps OLS) MUST use this helper — the
  * DuckDB replay hardcodes the same expression, so a diverging private
  * copy would silently break cross-engine bit-identity. Quantization
  * error is < 2^-20 nats per term, invisible at the 1e-6 output grid
  * for any realistic term count. */
object Quant {

  /** 2^20 — the log quantum shared with [[graft.events.Burst]]. */
  final val Scale = 1048576L

  /** floor(ln(x)·2^20 + 0.5) as a long; x must be positive. */
  def qln20(c: Column): Column =
    floor(log(c.cast("double")) * lit(Scale) + lit(0.5)).cast("long")
}
