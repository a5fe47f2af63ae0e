package graft.runner

import com.fasterxml.jackson.databind.JsonNode
import graft.expr.JsonSupport

/** Multi-API config composition — the derivation half of the reference's
  * `Sri2DbMulti` (client.js:2094-2145): each entry in `overwrites` is an
  * RFC 7386 JSON-merge-patch applied to a FRESH deep copy of the base
  * config (`sri2dbConfigs = config.overwrites.map(ow =>
  * jsonmergepatch.apply(clonedeep(config.baseConfig), ow))`,
  * client.js:2105), yielding one sync config per API stream. The derived
  * configs then run through [[MultiSync.run]] with bounded concurrency,
  * every result settled independently as a `Try` — the
  * isFulfilled/isRejected contract of README.md:231-238.
  *
  * Config shape: a JSON object; nested objects flatten to dotted keys
  * (`{"api": {"path": "/x"}}` → `api.path = /x`) so the reference's
  * nested config layout maps 1:1 onto the flat CLI opts map
  * [[graft.Main.run]] consumes. Scalars render with `asText` (numbers
  * and booleans arrive as their literal text, same as CLI flags); a null
  * in a patch DELETES the key (RFC 7386), which is how an overwrite
  * turns a base default off.
  */
object MultiRunner {

  /** One flat opts map per overwrite. A fresh parse of `baseJson` per
    * overwrite IS the reference's `clonedeep` — patches never observe
    * each other's mutations. */
  def deriveConfigs(baseJson: String,
                    overwrites: Seq[String]): Seq[Map[String, String]] = {
    val m = JsonSupport.mapper
    overwrites.map { ow =>
      val merged = JsonSupport.mergePatch(m.readTree(baseJson),
        m.readTree(ow))
      flatten("", merged)
    }
  }

  /** Derive + run: N settled results in `overwrites` order, at most
    * `concurrency` syncs in flight (reference default 1 — the
    * `pAll(tasks, {concurrency})` loop). */
  def runAll(baseJson: String, overwrites: Seq[String],
             concurrency: Int = 1)
            (runOne: Map[String, String] => SyncResult)
  : Seq[scala.util.Try[SyncResult]] = {
    require(concurrency > 0, "Concurrency must be a positive integer.")
    val cfgs = deriveConfigs(baseJson, overwrites)
    MultiSync.run(cfgs.map(c => () => runOne(c)), concurrency)
  }

  private def flatten(prefix: String, node: JsonNode): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val key = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
      val v = e.getValue
      if (v.isObject) out ++= flatten(key, v)
      // scalars render as their literal text; ARRAYS keep their JSON
      // form (ArrayNode.asText is the empty string — a silent
      // config-value loss, not a rendering)
      else if (v.isArray) out += key -> v.toString
      else if (!v.isNull) out += key -> v.asText()
    }
    out.result()
  }
}
