package graft.model

/** Built-in small substring model (3 classes × 10 features) used by the
  * SQL-oracle-checkable scoring queries and as a fixture-style default.
  * Weights are hand-chosen so predictions are exactly computable; schema
  * identical to the reference's exported JSON (`tools.py:102-108`).
  */
object DefaultModels {

  val tiny: LangIdModel = LangIdModel(
    features = Array("def ", "func ", "<?php", "import ", "$", "package ",
      "fmt.", "self.", "->", "range "),
    classes = Array("Go", "PHP", "Python"),
    coef = Array(
      Array(-1.2, 2.5, -0.7, -0.3, -0.9, 1.8, 2.2, -1.1, 0.4, 1.3),
      Array(-0.6, -0.8, 3.1, -0.2, 1.9, -0.5, -0.4, -0.3, 1.2, -0.1),
      Array(2.1, -1.4, -0.9, 1.6, -0.8, -0.6, -0.7, 2.3, -0.5, 0.2)),
    intercept = Array(0.1, -0.2, 0.3),
  )
}
