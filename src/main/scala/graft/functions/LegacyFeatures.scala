package graft.functions

import java.util.regex.Pattern

import graft.text.TokenMatcher

/** The reference's COMPLETE legacy named-feature catalog — all ~185
  * boolean features of `/root/reference/js/predict_language.js:120-306`,
  * re-expressed as DATA (an ADT over eight primitive forms) plus
  * interpreters, instead of 185 hand-written functions.
  *
  * Primitive forms (js:9-101):
  *  - Word: case-sensitive word-boundary containment (hasWordIn)
  *  - WordCi: the same over the lowercased text/word
  *  - Sym: plain substring containment
  *  - Re: multiline regex (JS `m` flag → Pattern.MULTILINE)
  *  - LineStart / Indent / IndentColon / FString / DollarVar: the
  *    structural predicates (shared with StructuralPredicates)
  *  - And / Or: feature combinations
  *
  * The batch extractor honors the engine's one-pass design rule: all Word
  * tokens ride ONE Aho–Corasick word-bit pass, all WordCi tokens one pass
  * over the lowered text, all Sym tokens one substring-automaton pass —
  * not 185 separate scans per row (the reference's JS does one scan per
  * feature; at 10^12 rows that multiplier matters).
  */
object LegacyFeatures {

  sealed trait Feat
  final case class Word(t: String) extends Feat
  final case class WordCi(t: String) extends Feat
  final case class Sym(t: String) extends Feat
  final case class Re(pattern: String) extends Feat
  final case class LineStart(p: String) extends Feat
  final case class Indent(n: Int) extends Feat
  case object IndentColonF extends Feat
  case object FStringF extends Feat
  case object DollarVarF extends Feat
  final case class And(a: Feat, b: Feat) extends Feat
  final case class Or(a: Feat, b: Feat) extends Feat

  /** The catalog, in the reference's declaration order (js:121-306). */
  val all: Seq[(String, Feat)] = Seq(
    "HasNoneTC" -> Word("None"),
    "HasSelf" -> Word("self"),
    "HasTrueTC" -> Word("True"),
    "HasFalseTC" -> Word("False"),
    "HasLambda" -> Word("lambda"),
    "HasIndentColon" -> IndentColonF,
    "HasTripleQuotes" -> Or(Sym("\"\"\""), Sym("'''")),
    "HasPythonFString" -> FStringF,
    "HasPublic" -> Word("public"),
    "HasStatic" -> Word("static"),
    "HasVoid" -> Word("void"),
    "HasNew" -> Word("new"),
    "HasPackage" -> Word("package"),
    "HasExtends" -> Word("extends"),
    "HasImplements" -> Word("implements"),
    "HasAtSymbol" -> Sym("@"),
    "HasLet" -> Word("let"),
    "HasConst" -> Word("const"),
    "HasVar" -> Word("var"),
    "HasFatArrow" -> Sym("=>"),
    "HasExport" -> Word("export"),
    "HasDefault" -> Word("default"),
    "HasFunc" -> Word("func"),
    "HasColonEquals" -> Sym(":="),
    "HasDefer" -> Word("defer"),
    "HasGoKeyword" -> Word("go"),
    "HasChan" -> Word("chan"),
    "HasLeftArrow" -> Sym("<-"),
    "HasEnd" -> Word("end"),
    "HasModule" -> Word("module"),
    "HasRequire" -> Word("require"),
    "HasDo" -> Word("do"),
    "HasPuts" -> Word("puts"),
    "HasPhpTag" -> Sym("<?php"),
    "HasDollarVar" -> DollarVarF,
    "HasNamespace" -> Word("namespace"),
    "HasUse" -> Word("use"),
    "HasEcho" -> Word("echo"),
    "HasThinArrow" -> Sym("->"),
    "HasDoubleColon" -> Sym("::"),
    "HasAsync" -> Word("async"),
    "HasAwait" -> Word("await"),
    "HasDef" -> Word("def"),
    "HasFunction" -> Word("function"),
    "HasImport" -> Word("import"),
    "HasFromImport" -> And(Word("from"), Word("import")),
    "HasFromImportOrder" -> Re(StructuralPredicates.FromImportOrderRe),
    "HasImportFromOrder" -> Re(StructuralPredicates.ImportFromOrderRe),
    "HasImportAs" -> Re(StructuralPredicates.ImportAsRe),
    "HasImportStarAs" -> Re(StructuralPredicates.ImportStarAsRe),
    "HasImportQuoteLine" -> Re(StructuralPredicates.ImportQuoteLineRe),
    "HasClass" -> Word("class"),
    "HasSemicolon" -> Sym(";"),
    "HasHashComment" -> Sym("#"),
    "HasDecoratorLine" -> LineStart("@"),
    "HasThisDot" -> Sym("this."),
    "HasThisArrow" -> Sym("$this->"),
    "HasDollarThis" -> Sym("$this"),
    "HasKwargs" -> Sym("**kwargs"),
    "HasArgs" -> Sym("*args"),
    "HasAngleQuestion" -> Sym("<?"),
    "HasAngleBrackets" -> And(Sym("<"), Sym(">")),
    "HasDollarParen" -> Sym("($"),
    "HasDotPlus" -> Sym(".+"),
    "HasPlusEquals" -> Sym("+="),
    "HasAmpDollar" -> Sym("&$"),
    "HasSpaceColonSpace" -> Sym(" : "),
    "HasSlashStarHash" -> Sym("/*#"),
    "HasPrivate" -> Word("private"),
    "HasProtected" -> Word("protected"),
    "HasBool" -> Word("bool"),
    "HasBoolean" -> Word("boolean"),
    "HasStr" -> Word("str"),
    "HasString" -> Word("string"),
    "HasStringTC" -> Word("String"),
    "HasStdString" -> And(And(Word("std"), Sym("::")), Word("string")),
    "HasCString" -> Word("cstring"),
    "HasChar" -> Word("char"),
    "HasByte" -> Word("byte"),
    "HasBytes" -> Word("bytes"),
    "HasStrlen" -> Word("strlen"),
    "HasTabs" -> Sym("\t"),
    "HasIndentTwoSpaces" -> Indent(2),
    "HasIndentFourSpaces" -> Indent(4),
    "HasDefLineColon" -> Re("""^\s*def\s+\w+\s*\(.*\)\s*:"""),
    "HasGenericWildcard" -> Re("""<\?\s*(extends|super)\b"""),
    "HasDiffHeader" -> LineStart("diff --git"),
    "HasDiffHunk" -> LineStart("@@"),
    "HasDiffFilePlus" -> LineStart("+++"),
    "HasDiffFileMinus" -> LineStart("---"),
    "HasMakeTarget" -> Re("""^[A-Za-z0-9_.-]+:\s"""),
    "HasMakeVar" -> Sym("$("),
    "HasPhony" -> Word(".PHONY"),
    "HasMakeAssign" -> Re("""^\s*[A-Za-z0-9_.-]+\s*[:?+]?="""),
    "HasMakeShell" -> Sym("$(shell "),
    "HasMakeRecipeTab" -> Re("^\t"),
    "HasIncludeStdIO" -> Sym("#include <stdio"),
    "HasPrintf" -> Word("printf"),
    "HasScanf" -> Word("scanf"),
    "HasIostream" -> Sym("#include <iostream"),
    "HasStdNamespace" -> Sym("std::"),
    "HasTemplate" -> Word("template"),
    "HasRustFnArrow" -> Re("""\bfn\s+\w+\s*\(.*\)\s*->"""),
    "HasRustUse" -> And(Word("use"), Sym("::")),
    "HasRustMacroRules" -> Sym("macro_rules!"),
    "HasRustDerive" -> Sym("#[derive"),
    "HasLetMut" -> And(Word("let"), Word("mut")),
    "HasRustMatch" -> Word("match"),
    "HasGoPackage" -> Word("package"),
    "HasGoImportBlock" -> Sym("import ("),
    "HasCssProperty" -> Re("""\b(color|display|font|margin|padding|border)\s*:"""),
    "HasScssVar" -> Re("""\$[A-Za-z_-][A-Za-z0-9_-]*\s*:"""),
    "HasScssMixin" -> Word("@mixin"),
    "HasScssInclude" -> Word("@include"),
    "HasScssExtend" -> Word("@extend"),
    "HasScssInterp" -> Sym("#{"),
    "HasScssNestedAmp" -> Re("""&[.:#\[]"""),
    "HasLessVar" -> Re("""@[A-Za-z_-][A-Za-z0-9_-]*\s*:"""),
    "HasLessInterp" -> Sym("@{"),
    "HasLessGuard" -> And(Word("when"), Sym("(")),
    "HasLessImportOpts" -> Sym("@import ("),
    "HasLessMixinCall" -> Re("""\.[A-Za-z_-][A-Za-z0-9_-]*\s*\("""),
    "HasLessVarUse" -> Re("""@[A-Za-z_-][A-Za-z0-9_-]*\b"""),
    "HasSqlSelect" -> WordCi("select"),
    "HasSqlFrom" -> WordCi("from"),
    "HasSqlWhere" -> WordCi("where"),
    "HasSqlCreateTable" -> And(WordCi("create"), WordCi("table")),
    "HasSqlInsertInto" -> And(WordCi("insert"), WordCi("into")),
    "HasJsonObject" -> And(And(Sym("{"), Sym("}")), Re(""""[^"]+"\s*:""")),
    "HasIniSection" -> Re("""^\s*\[[^\]]+\]\s*$"""),
    "HasIniKeyValue" -> Re("""^\s*[A-Za-z0-9_.-]+\s*=\s*.+$"""),
    "HasIniComment" -> Re("""^\s*[#;]"""),
    "HasYamlList" -> LineStart("- "),
    "HasYamlDocMarker" -> Or(LineStart("---"), LineStart("...")),
    "HasYamlKeyValue" -> Re("""^\s*[A-Za-z0-9_.-]+\s*:\s+.+$"""),
    "HasMarkdownHeading" -> LineStart("#"),
    "HasMarkdownList" -> Re("""^\s*[-*+]\s+"""),
    "HasMarkdownOrdered" -> Re("""^\s*\d+\.\s+"""),
    "HasMarkdownQuote" -> Re("""^\s*>"""),
    "HasMarkdownUnderlineHeading" -> Or(Re("""^\s*={2,}\s*$"""), Re("""^\s*-{2,}\s*$""")),
    "HasMarkdownFence" -> Sym("```"),
    "HasMarkdownLink" -> Sym("]("),
    "HasXmlDecl" -> Sym("<?xml"),
    "HasXmlNs" -> Sym("xmlns"),
    "HasGraphQlQuery" -> WordCi("query"),
    "HasGraphQlMutation" -> WordCi("mutation"),
    "HasGraphQlFragment" -> WordCi("fragment"),
    "HasGraphQlSpread" -> Sym("... on"),
    "HasTsInterface" -> Word("interface"),
    "HasTsTypeAlias" -> Word("type"),
    "HasTsImplements" -> Word("implements"),
    "HasTsEnum" -> Word("enum"),
    "HasTsAs" -> Word("as"),
    "HasTsReadonly" -> Word("readonly"),
    "HasTsAccessMod" -> Or(Or(Word("public"), Word("private")), Word("protected")),
    "HasShebang" -> LineStart("#!"),
    "HasShellExport" -> Word("export"),
    "HasShellIf" -> Or(Sym("if ["), Sym("if test")),
    "HasShellFi" -> Word("fi"),
    "HasShellThen" -> Word("then"),
    "HasShellDo" -> Word("do"),
    "HasShellDone" -> Word("done"),
    "HasShellVar" -> Re("""\$[A-Za-z_][A-Za-z0-9_]*"""),
    "HasPerlStrict" -> Sym("use strict"),
    "HasPerlWarnings" -> Sym("use warnings"),
    "HasPerlMySigil" -> Sym("my $"),
    "HasPerlArgv" -> Sym("@ARGV"),
    "HasPerlRegexSub" -> Re("""\bs/.+/.*?/"""),
    "HasLuaLocal" -> Word("local"),
    "HasLuaThen" -> Word("then"),
    "HasLuaElseIf" -> Word("elseif"),
    "HasLuaConcat" -> Sym(".."),
    "HasRAssign" -> Re("""\s<-\s"""),
    "HasRLibrary" -> Word("library"),
    "HasRDataFrame" -> Sym("data.frame("),
    "HasRGgplot" -> Sym("ggplot("),
    "HasRSetSeed" -> Sym("set.seed("),
    "HasRTrueFalse" -> Or(Word("TRUE"), Word("FALSE")),
    "HasMainFunc" -> Re("""\bint\s+main\s*\("""),
    "HasReturnZero" -> Re("""\breturn\s+0\s*;"""),
    "HasVbImports" -> Word("Imports"),
    "HasVbModule" -> Word("Module"),
    "HasVbSub" -> Word("Sub"),
    "HasVbEndSub" -> Sym("End Sub"),
    "HasVbDim" -> Word("Dim"),
    "HasVbAs" -> Word("As"),
  )
  require(all.map(_._1).distinct.length == all.length, "duplicate feature names")

  val names: Array[String] = all.map(_._1).toArray

  /** JS `text.split(/\r\n|\n|\r/)` — keeps trailing empty strings. */
  def splitJsLines(text: String): Array[String] = text.split("\r\n|\n|\r", -1)

  private def collect(pf: PartialFunction[Feat, String]): Array[String] = {
    def walk(f: Feat): Seq[String] = f match {
      case And(a, b) => walk(a) ++ walk(b)
      case Or(a, b)  => walk(a) ++ walk(b)
      case other     => pf.lift(other).toSeq
    }
    all.flatMap(f => walk(f._2)).distinct.toArray
  }

  /** Batched extractor: build once on the driver, broadcast, call
    * `extract` per row. Three automaton passes + the regex set — NOT one
    * scan per feature. */
  final class Extractor extends Serializable {
    private val wordToks = collect { case Word(t) => t }
    private val wordCiToks = collect { case WordCi(t) => t.toLowerCase(java.util.Locale.ROOT) }
    private val symToks = collect { case Sym(t) => t }
    private val rePatterns = collect { case Re(p) => p }
    private val wIdx = wordToks.zipWithIndex.toMap
    private val wCiIdx = wordCiToks.zipWithIndex.toMap
    private val sIdx = symToks.zipWithIndex.toMap
    private val reIdx = rePatterns.zipWithIndex.toMap
    private val wordMatcher = TokenMatcher(wordToks)
    private val wordCiMatcher = TokenMatcher(wordCiToks)
    private val symMatcher = TokenMatcher(symToks)
    @transient private lazy val compiled: Array[Pattern] =
      rePatterns.map(p => Pattern.compile(p, Pattern.MULTILINE))

    def extract(text0: String): Array[Boolean] = {
      val text = if (text0 == null) "" else text0
      val lower = text.toLowerCase(java.util.Locale.ROOT)
      val lines = splitJsLines(text)
      // Re features run over CR/CRLF-normalized text: Java MULTILINE
      // honors lone \r (and NEL/LS/PS) as ^/$ anchors while the RE2
      // oracle's '(?m)' honors only \n — a CR-only document would flip
      // features engine-side only (see StructuralPredicates scaladoc)
      lazy val reText = graft.text.Normalize.newlines(text)
      val wBits = wordMatcher.matchWordBits(text)
      val wCiBits = wordCiMatcher.matchWordBits(lower)
      val sBits = symMatcher.matchBits(text)
      def eval(f: Feat): Boolean = f match {
        case Word(t)      => wBits(wIdx(t))
        case WordCi(t)    => wCiBits(wCiIdx(t.toLowerCase(java.util.Locale.ROOT)))
        case Sym(t)       => sBits(sIdx(t))
        case Re(p)        => compiled(reIdx(p)).matcher(reText).find()
        case LineStart(p) => StructuralPredicates.hasLineStartingWith(lines, p)
        case Indent(n)    => StructuralPredicates.hasLeadingIndent(lines, n)
        case IndentColonF => StructuralPredicates.hasIndentColons(lines)
        case FStringF     => StructuralPredicates.hasPythonFString(text)
        case DollarVarF   => StructuralPredicates.hasDollarVar(text)
        case And(a, b)    => eval(a) && eval(b)
        case Or(a, b)     => eval(a) || eval(b)
      }
      val out = new Array[Boolean](all.length)
      var i = 0
      while (i < out.length) { out(i) = eval(all(i)._2); i += 1 }
      out
    }
  }
}
