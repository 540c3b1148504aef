package graft.turtle

import Ast._
import scala.collection.mutable

/** AST → RDF triples, an order-sensitive fold over the statement list
  * (reference: /root/reference/src/triple_production.rs:33-310).
  *
  * Semantics replicated from the reference, including its deviations:
  *  - `@base`/`BASE` set the base IRI (must be absolute); `@prefix`/`PREFIX`
  *    upsert the namespace map, empty prefix under key "" — later directives
  *    override (triple_production.rs:263-277).
  *  - IRIREFs are resolved against the base ONLY if a base was set
  *    (triple_production.rs:339-342); prefixed names concatenate
  *    `namespaces(prefix) + local` with NO base resolution of the prefix IRI
  *    (triple_production.rs:317-327 — deliberate deviation from the spec).
  *  - undeclared prefix → error (345-350); empty local name → error (323).
  *  - `a` → rdf:type (330-335).
  *  - literal lexical forms are UNESCAPED; datatype defaulting: explicit
  *    `^^iri`, else xsd:string — note a language-tagged literal also gets
  *    xsd:string, not rdf:langString (109-124, reference behavior).
  *  - booleans → xsd:boolean; Integer/Decimal/Double → xsd:integer/decimal/
  *    double with the exact source spelling (125-151).
  *  - collections → rdf:first/rdf:rest cons cells ending in rdf:nil; the
  *    empty collection is the rdf:nil IRI (192-242).
  *  - REFUSALS kept for P/R alignment: collection-as-subject and
  *    blankNodePropertyList-as-subject are errors (62-67, 75-78).
  *
  * Blank nodes: the reference uses a process-global unique id (390-402) —
  * non-deterministic under Spark task retries. We instead allocate a
  * per-document sequence number in traversal order; labeled nodes memoize by
  * label. Determinism makes output stable across retries/parallelism and
  * bnode-isomorphic to the reference's.
  */
object TripleProducer {

  val RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  val RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  val RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
  val XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
  val XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"
  val XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
  val XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
  val XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"

  sealed trait Term extends Product with Serializable
  final case class TIri(iri: String) extends Term
  /** Per-document sequence id, deterministic in traversal order. */
  final case class TBnode(id: Int) extends Term
  final case class TLit(
      lex: String,
      datatype: Option[String],
      lang: Option[String]) extends Term

  final case class RdfTriple(subj: Term, pred: String, obj: Term)

  final class ProduceException(msg: String) extends Exception(msg)

  def produce(doc: TurtleDoc): Either[String, Vector[RdfTriple]] =
    try Right(new Producer().run(doc))
    catch { case e: ProduceException => Left(e.getMessage) }

  private final class Producer {
    private var baseUri: Option[IriResolver.IriParts] = None
    private val namespaces = mutable.HashMap.empty[String, String]
    private val bnodeLabels = mutable.HashMap.empty[String, TBnode]
    private var counter = 0
    private var curSubj: Option[Term] = None
    private var curPred: Option[String] = None
    private val out = Vector.newBuilder[RdfTriple]

    private def err(msg: String): Nothing = throw new ProduceException(msg)

    def run(doc: TurtleDoc): Vector[RdfTriple] = {
      doc.statements.foreach {
        case StDirective(d) => applyDirective(d)
        case StTriples(t) =>
          curSubj = None
          curPred = None
          t match {
            case TriplesLabeled(_, subject, pol) =>
              subject match {
                case SubjIri(iri) => curSubj = Some(TIri(convertIri(iri)))
                case SubjBlankNode(bn) => curSubj = Some(allocate(bn))
                case SubjCollection(_) =>
                  err("Collections are not supported in TripleProducer yet.")
              }
              producePol(pol)
            case TriplesBlank(_, _, _) =>
              err("Production of triple statements with blankNodePropertyList as subject not supported yet.")
          }
      }
      out.result()
    }

    private def applyDirective(d: Directive): Unit = d match {
      case BaseDirective(_, iri) =>
        baseUri = Some(IriResolver.parseBase(iri.iri).fold(err, identity))
      case SparqlBaseDirective(_, iri) =>
        baseUri = Some(IriResolver.parseBase(iri.iri).fold(err, identity))
      case PrefixDirective(_, pfx, iri) =>
        namespaces(pfx.getOrElse("")) = iri.iri
      case SparqlPrefixDirective(_, pfx, iri) =>
        namespaces(pfx.getOrElse("")) = iri.iri
    }

    private def producePol(pol: PredicateObjectList): Unit =
      pol.items.foreach { item =>
        curPred = Some(convertVerb(item.verb))
        item.objects.items.foreach { oli =>
          val rdfObj = produceObject(oli.obj)
          produceTriple(rdfObj)
        }
      }

    private def produceObject(o: Obj): Term = o match {
      case ObjIri(iri) => TIri(convertIri(iri))
      case ObjLiteral(lit) => convertLiteral(lit)
      case ObjBlankNode(bn) => allocate(bn)
      case ObjCollection(coll) => produceCollection(coll)
      case ObjBnpl(bnpl) =>
        val bn = freshBnode()
        val stashS = curSubj
        val stashP = curPred
        curSubj = Some(bn)
        producePol(bnpl.pol)
        curSubj = stashS
        curPred = stashP
        bn
    }

    /** triple_production.rs:192-242 */
    private def produceCollection(coll: Collection): Term = {
      val stashS = curSubj
      val stashP = curPred
      val result: Term =
        if (coll.items.isEmpty) TIri(RDF_NIL)
        else {
          var first: Option[TBnode] = None
          var previous: Option[TBnode] = None
          coll.items.foreach { item =>
            val cur = freshBnode()
            if (first.isEmpty) first = Some(cur)
            if (previous.isDefined) {
              curPred = Some(RDF_REST)
              produceTriple(cur)
            }
            curSubj = Some(cur)
            curPred = Some(RDF_FIRST)
            val rdfObj = produceObject(item.obj)
            produceTriple(rdfObj)
            previous = Some(cur)
          }
          curPred = Some(RDF_REST)
          produceTriple(TIri(RDF_NIL))
          first.get
        }
      curSubj = stashS
      curPred = stashP
      result
    }

    private def convertLiteral(lit: Literal): Term = lit match {
      case LitRdf(r) =>
        val lex = r.string.lexicalForm.fold(err, identity)
        val dt = r.datatypeIri.map(convertIri).orElse(Some(XSD_STRING))
        TLit(lex, dt, r.languageTag)
      case LitBoolean(b) =>
        TLit(if (b) "true" else "false", Some(XSD_BOOLEAN), None)
      case LitNumeric(nm) =>
        val dt = nm match {
          case _: IntegerLit => XSD_INTEGER
          case _: DecimalLit => XSD_DECIMAL
          case _: DoubleLit  => XSD_DOUBLE
        }
        TLit(nm.lexicalForm, Some(dt), None)
    }

    private def allocate(bn: BlankNode): Term = bn match {
      case BlankNodeAnon(_)   => freshBnode()
      case BlankNodeLabel(lb) => bnodeLabels.getOrElseUpdate(lb, freshBnode())
    }

    private def freshBnode(): TBnode = {
      val b = TBnode(counter)
      counter += 1
      b
    }

    private def produceTriple(obj: Term): Unit = {
      val s = curSubj.getOrElse(
        err("Trying to produce triple without current subject"))
      val p = curPred.getOrElse(
        err("Trying to produce triple without current predicate"))
      out += RdfTriple(s, p, obj)
    }

    private def convertIri(iri: Iri): String = iri match {
      case IriRef(raw) =>
        baseUri match {
          case None       => raw // no base → verbatim, unvalidated (triple_production.rs:339-342)
          case Some(base) => IriResolver.resolveChecked(base, raw).fold(err, identity)
        }
      case PrefixedName(pfx, name) =>
        val ns = namespaces.getOrElse(pfx.getOrElse(""),
          err(s"Unable to resolve prefix `${pfx.getOrElse("")}`"))
        val local = name.getOrElse(err("Empty local_name part of PrefixedName"))
        ns + local
    }

    private def convertVerb(v: Verb): String = v match {
      case VerbA        => RDF_TYPE
      case VerbIri(iri) => convertIri(iri)
    }
  }
}
