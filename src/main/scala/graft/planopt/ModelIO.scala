package graft.planopt

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.planopt.PlanFeatures.{FeatureGenerator, Normalizer}

/** Save/load for a trained comparator — the Spark-native counterpart
  * of the reference's model directory (`Lero/model.py:100-126`: torch
  * `nn_weights` + pickled `feature_generator` + `input_feature_dim`;
  * the committed `saved_models/stats/stable_model/` is that format).
  * A deployed optimizer must survive a JVM restart: `PlanChoice`
  * installs from this directory, and `StableMain` writes it next to
  * its training log.
  *
  * Layout (no pickle — JSON metadata + raw binary weights):
  *  - `model_meta.json`: format version, `input_feature_dim`, the op
  *    vocabulary, the input-table vocabulary, and the log-min-max
  *    normalizer bounds (JSON doubles round-trip exactly in Java —
  *    `Double.toString` is shortest-round-trip);
  *  - `nn_weights.bin`: big-endian stream, one block per parameter in
  *    `LeroNet.paramGrads` order (conv1..3 w/b, fc1..2 w/b), each
  *    `int32 length` + `length` raw `float64`s — bit-exact.
  */
object ModelIO {

  private val FormatVersion = 1
  private val MetaFile = "model_meta.json"
  private val WeightsFile = "nn_weights.bin"
  private val GateMetaFile = "bayes_meta.json"
  private val GateWeightsFile = "bayes_weights.bin"

  def save(dir: String, model: LeroModelPairWise, gen: FeatureGenerator): Unit = {
    require(model.featureDim == gen.featureDim,
      s"model dim ${model.featureDim} != featurizer dim ${gen.featureDim}")
    Files.createDirectories(Paths.get(dir))

    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("format_version", FormatVersion)
    root.put("input_feature_dim", model.featureDim)
    val ops = root.putArray("op_types")
    gen.opTypes.foreach(ops.add)
    val rels = root.putArray("input_relations")
    gen.inputRelations.foreach(rels.add)
    def putBounds(field: String, m: Map[String, Double]): Unit = {
      val n = root.putObject(field)
      m.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
    }
    putBounds("normalizer_mins", gen.normalizer.mins)
    putBounds("normalizer_maxs", gen.normalizer.maxs)
    Files.write(Paths.get(dir, MetaFile),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))

    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(Paths.get(dir, WeightsFile).toFile)))
    try {
      model.net.paramGrads.foreach { case (param, _) =>
        out.writeInt(param.length)
        var i = 0
        while (i < param.length) { out.writeDouble(param(i)); i += 1 }
      }
    } finally out.close()
  }

  /** Persist the calibrated Bayesian margin gate next to the main
    * comparator (optional files — a pre-gate artifact stays loadable).
    * Same weight-block format as `nn_weights.bin`, covering the gate's
    * trunk AND head parameters; the calibrated threshold and its
    * train-split evidence ride in `bayes_meta.json`. */
  def saveGate(dir: String, bm: BayesianModelPairWise,
               cal: Pipelines.GateCalibration): Unit = {
    Files.createDirectories(Paths.get(dir))
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("format_version", FormatVersion)
    root.put("input_feature_dim", bm.featureDim)
    root.put("threshold", cal.threshold)
    root.put("score_gap_threshold", cal.scoreGapThreshold)
    root.put("calibration_pairs", cal.nPairs)
    root.put("calibration_routed", cal.nRouted)
    root.put("calibration_net_gain_ms", cal.netGainMs)
    root.put("calibration_ungated_gain_ms", cal.gainAllMs)
    Files.write(Paths.get(dir, GateMetaFile),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(Paths.get(dir, GateWeightsFile).toFile)))
    try {
      (bm.net.paramGrads ++ bm.head.paramGrads).foreach { case (param, _) =>
        out.writeInt(param.length)
        var i = 0
        while (i < param.length) { out.writeDouble(param(i)); i += 1 }
      }
    } finally out.close()
  }

  /** Load the margin gate if the artifact carries one; None for
    * pre-gate artifacts (the strategy then routes ungated, the pre-r18
    * behavior). Returns (model, zThreshold, scoreGapThreshold); a
    * z-only artifact (no gap field) loads with gap threshold 0 —
    * every proposed gap clears it, the one-axis behavior. */
  def loadGate(dir: String): Option[(BayesianModelPairWise, Double, Double)] = {
    val meta = Paths.get(dir, GateMetaFile)
    val weights = Paths.get(dir, GateWeightsFile)
    if (!Files.exists(meta) || !Files.exists(weights)) return None
    val mapper = new ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(meta)).asInstanceOf[ObjectNode]
    val version = root.get("format_version").asInt()
    require(version == FormatVersion,
      s"unsupported gate format version $version (expected $FormatVersion)")
    val dim = root.get("input_feature_dim").asInt()
    val thr = root.get("threshold").asDouble()
    val gapThr = Option(root.get("score_gap_threshold"))
      .map(_.asDouble()).getOrElse(0.0)
    val bm = new BayesianModelPairWise(dim)
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(weights.toFile)))
    try {
      (bm.net.paramGrads ++ bm.head.paramGrads).foreach { case (param, _) =>
        val n = in.readInt()
        require(n == param.length,
          s"gate weight block length $n != expected ${param.length} " +
            "(architecture/dim mismatch)")
        var i = 0
        while (i < n) { param(i) = in.readDouble(); i += 1 }
      }
      require(in.read() == -1, s"trailing bytes in $GateWeightsFile")
    } finally in.close()
    Some((bm, thr, gapThr))
  }

  def load(dir: String): (LeroModelPairWise, FeatureGenerator) = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(
      Files.readAllBytes(Paths.get(dir, MetaFile))).asInstanceOf[ObjectNode]
    val version = root.get("format_version").asInt()
    require(version == FormatVersion,
      s"unsupported model format version $version (expected $FormatVersion)")
    val dim = root.get("input_feature_dim").asInt()
    def strings(field: String): Vector[String] = {
      val it = root.get(field).elements()
      val buf = Vector.newBuilder[String]
      while (it.hasNext) buf += it.next().asText()
      buf.result()
    }
    def bounds(field: String): Map[String, Double] = {
      val node = root.get(field)
      val it = node.fields()
      val buf = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        buf += e.getKey -> e.getValue.asDouble()
      }
      buf.result()
    }
    val gen = FeatureGenerator.restore(
      Normalizer(bounds("normalizer_mins"), bounds("normalizer_maxs")),
      strings("input_relations"), strings("op_types"))
    require(gen.featureDim == dim,
      s"persisted input_feature_dim $dim != reconstructed featurizer dim ${gen.featureDim}")

    val model = new LeroModelPairWise(dim)
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(Paths.get(dir, WeightsFile).toFile)))
    try {
      model.net.paramGrads.foreach { case (param, _) =>
        val n = in.readInt()
        require(n == param.length,
          s"weight block length $n != expected ${param.length} " +
            "(architecture/dim mismatch)")
        var i = 0
        while (i < n) { param(i) = in.readDouble(); i += 1 }
      }
      require(in.read() == -1, s"trailing bytes in $WeightsFile")
    } finally in.close()
    (model, gen)
  }
}
