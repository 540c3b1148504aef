package graft.turtle

import Ast._

/** Lossless serializer — the `gen` side of every reference production
  * (reference: /root/reference/src/lib.rs gen fns).
  *
  * Invariant (reference README.md:22, tests/roundtrip_examples.rs:19):
  * `render(parse(input)) == input` byte-for-byte on documents the parser
  * accepts. Two deliberate normalizations carried over from the reference:
  *  - intra-directive whitespace renders as single spaces (lib.rs:769-778,
  *    865-877) — the parser discards it, so identity holds for single-space
  *    inputs (all of the corpus);
  *  - the whitespace before a statement's final '.' renders as exactly
  *    `" ."` (lib.rs:219,226) — the parser requires and discards >=1 ws
  *    there.
  */
object TurtleSerializer {

  def render(doc: TurtleDoc): String = {
    val sb = new java.lang.StringBuilder(256)
    doc.statements.foreach(genStatement(sb, _))
    doc.trailingWs.foreach(sb.append)
    sb.toString
  }

  private def genStatement(sb: java.lang.StringBuilder, s: Statement): Unit =
    s match {
      case StDirective(d) => genDirective(sb, d)
      case StTriples(t)   => genTriples(sb, t)
    }

  private def genDirective(sb: java.lang.StringBuilder, d: Directive): Unit =
    d match {
      case BaseDirective(w, iri) =>
        w.foreach(sb.append)
        sb.append("@base "); genIriRef(sb, iri); sb.append(" .")
      case SparqlBaseDirective(w, iri) =>
        w.foreach(sb.append)
        sb.append("BASE "); genIriRef(sb, iri)
      case PrefixDirective(w, pfx, iri) =>
        w.foreach(sb.append)
        sb.append("@prefix ")
        pfx.foreach(sb.append)
        sb.append(": "); genIriRef(sb, iri); sb.append(" .")
      case SparqlPrefixDirective(w, pfx, iri) =>
        w.foreach(sb.append)
        sb.append("PREFIX ")
        pfx.foreach(sb.append)
        sb.append(": "); genIriRef(sb, iri)
    }

  private def genTriples(sb: java.lang.StringBuilder, t: Triples): Unit =
    t match {
      case TriplesLabeled(w, subj, pol) =>
        w.foreach(sb.append)
        genSubject(sb, subj)
        genPol(sb, pol)
        sb.append(" .")
      case TriplesBlank(w, bnpl, polOpt) =>
        w.foreach(sb.append)
        genBnpl(sb, bnpl)
        polOpt.foreach(genPol(sb, _))
        sb.append(" .")
    }

  private def genSubject(sb: java.lang.StringBuilder, s: Subject): Unit =
    s match {
      case SubjIri(i)        => genIri(sb, i)
      case SubjBlankNode(b)  => genBlankNode(sb, b)
      case SubjCollection(c) => genCollection(sb, c)
    }

  /** Items joined by ';' (cf_separated_list, lib.rs:476-490). */
  private def genPol(sb: java.lang.StringBuilder, pol: PredicateObjectList): Unit = {
    var first = true
    pol.items.foreach { it =>
      if (!first) sb.append(';')
      first = false
      it.leadingWs.foreach(sb.append)
      genVerb(sb, it.verb)
      genObjectList(sb, it.objects)
      it.preSemiWs.foreach(sb.append)
    }
  }

  private def genVerb(sb: java.lang.StringBuilder, v: Verb): Unit = v match {
    case VerbA      => sb.append('a')
    case VerbIri(i) => genIri(sb, i)
  }

  /** ',' before every item after the first (lib.rs:593-607). */
  private def genObjectList(sb: java.lang.StringBuilder, ol: ObjectList): Unit = {
    var i = 0
    ol.items.foreach { it =>
      it.wsBefore.foreach(sb.append)
      if (i != 0) sb.append(',')
      it.wsAfter.foreach(sb.append)
      genObj(sb, it.obj)
      i += 1
    }
  }

  private def genObj(sb: java.lang.StringBuilder, o: Obj): Unit = o match {
    case ObjIri(i)        => genIri(sb, i)
    case ObjBlankNode(b)  => genBlankNode(sb, b)
    case ObjCollection(c) => genCollection(sb, c)
    case ObjBnpl(b)       => genBnpl(sb, b)
    case ObjLiteral(l)    => genLiteral(sb, l)
  }

  private def genCollection(sb: java.lang.StringBuilder, c: Collection): Unit = {
    sb.append('(')
    c.items.foreach { it =>
      it.wsBefore.foreach(sb.append)
      genObj(sb, it.obj)
      it.wsAfter.foreach(sb.append)
    }
    sb.append(')')
  }

  private def genBnpl(sb: java.lang.StringBuilder, b: BlankNodePropertyList): Unit = {
    sb.append('[')
    genPol(sb, b.pol)
    b.trailingWs.foreach(sb.append)
    sb.append(']')
  }

  private def genIri(sb: java.lang.StringBuilder, i: Iri): Unit = i match {
    case r: IriRef => genIriRef(sb, r)
    case PrefixedName(pfx, name) =>
      pfx.foreach(sb.append)
      sb.append(':')
      name.foreach(sb.append)
  }

  private def genIriRef(sb: java.lang.StringBuilder, r: IriRef): Unit = {
    sb.append('<'); sb.append(r.iri); sb.append('>')
  }

  private def genBlankNode(sb: java.lang.StringBuilder, b: BlankNode): Unit =
    b match {
      case BlankNodeLabel(l) => sb.append("_:"); sb.append(l)
      case BlankNodeAnon(w) =>
        sb.append('['); w.foreach(sb.append); sb.append(']')
    }

  private def genLiteral(sb: java.lang.StringBuilder, l: Literal): Unit =
    l match {
      case LitRdf(r) =>
        genString(sb, r.string)
        r.languageTag.foreach { t => sb.append('@'); sb.append(t) }
        r.datatypeIri.foreach { i => sb.append("^^"); genIri(sb, i) }
      case LitBoolean(b) => sb.append(if (b) "true" else "false")
      case LitNumeric(nm) => sb.append(nm.lexicalForm)
    }

  private def genString(sb: java.lang.StringBuilder, s: TurtleString): Unit =
    s match {
      case StringQuote(r) =>
        sb.append('"'); sb.append(r); sb.append('"')
      case StringSingleQuote(r) =>
        sb.append('\''); sb.append(r); sb.append('\'')
      case StringLongQuote(r) =>
        sb.append("\"\"\""); sb.append(r); sb.append("\"\"\"")
      case StringLongSingleQuote(r) =>
        sb.append("'''"); sb.append(r); sb.append("'''")
    }
}
