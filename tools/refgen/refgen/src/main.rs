//! Golden-triple generator: runs the REFERENCE implementation
//! (harriet's own `TurtleDocument::parse_full` + `TripleProducer::
//! produce_for_document`, /root/reference/src/triple_production.rs:33-85)
//! over every fixture and dumps canonical TSV lines in exactly the format of
//! graft's `GoldenTriples.canonicalLines` (blank nodes relabeled `_:cN` in
//! first-appearance order), so the Scala engine's P/R >= 0.95 gate compares
//! against reference-produced triples instead of self-generated ones.
//!
//! Usage: refgen <fixtures-root> <out-dir>
//!   fixtures-root: directory containing reference_examples/ + wildtype_examples/
//!   out-dir: where <subdir>_<name>.tsv files are written
//!
//! Also re-checks the reference's own round-trip byte-identity per fixture
//! (to_string() == input) as a sanity check of the shim substrate, and writes
//! a status.tsv with one row per fixture: name, parse/produce outcome,
//! roundtrip flag, triple count.

use harriet::triple_production::{
    RdfBlankNode, RdfObject, RdfPredicate, RdfSubject, RdfTriple, TripleProducer,
};
use harriet::TurtleDocument;
use std::collections::HashMap;
use std::fs;
use std::path::Path;

fn canonical_lines(triples: &[RdfTriple]) -> Vec<String> {
    let mut ids: HashMap<RdfBlankNode, usize> = HashMap::new();
    let mut b = |bn: &RdfBlankNode, ids: &mut HashMap<RdfBlankNode, usize>| {
        let next = ids.len();
        let id = *ids.entry(bn.clone()).or_insert(next);
        format!("_:c{}", id)
    };
    triples
        .iter()
        .map(|t| {
            let s = match &t.subject {
                RdfSubject::IRI(i) => format!("<{}>", i.iri),
                RdfSubject::BlankNode(bn) => b(bn, &mut ids),
            };
            let RdfPredicate::IRI(p) = &t.predicate;
            let o = match &t.object {
                RdfObject::IRI(i) => format!("<{}>", i.iri),
                RdfObject::BlankNode(bn) => b(bn, &mut ids),
                RdfObject::Literal(l) => {
                    let esc = l
                        .lexical_form
                        .replace('\\', "\\\\")
                        .replace('\n', "\\n")
                        .replace('\t', "\\t");
                    format!(
                        "\"{}\"{}{}",
                        esc,
                        l.language_tag
                            .as_ref()
                            .map(|g| format!("@{}", g))
                            .unwrap_or_default(),
                        l.datatype_iri
                            .as_ref()
                            .map(|d| format!("^^<{}>", d.iri))
                            .unwrap_or_default(),
                    )
                }
            };
            format!("{}\t<{}>\t{}", s, p.iri, o)
        })
        .collect()
}

fn main() {
    let args: Vec<String> = std::env::args().collect();
    let fixtures_root = Path::new(&args[1]);
    let out_dir = Path::new(&args[2]);
    fs::create_dir_all(out_dir).unwrap();

    let mut status: Vec<String> = Vec::new();
    let mut names: Vec<(String, std::path::PathBuf)> = Vec::new();
    for sub in ["reference_examples", "wildtype_examples"] {
        let dir = fixtures_root.join(sub);
        let mut entries: Vec<_> = fs::read_dir(&dir)
            .unwrap_or_else(|e| panic!("read_dir {:?}: {}", dir, e))
            .map(|e| e.unwrap().path())
            .filter(|p| p.extension().map(|x| x == "ttl").unwrap_or(false))
            .collect();
        entries.sort();
        for p in entries {
            let name = format!("{}/{}", sub, p.file_name().unwrap().to_str().unwrap());
            names.push((name, p));
        }
    }

    for (name, path) in names {
        let text = fs::read_to_string(&path).unwrap();
        let flat = name.replace('/', "_");
        match TurtleDocument::parse_full(&text) {
            Err(e) => {
                status.push(format!("{}\tparse_err\t-\t0\t{:?}", name, kind(&e)));
            }
            Ok(doc) => {
                let rendered = doc.to_string();
                let rt = if rendered == text { "rt_ok" } else { "RT_FAIL" };
                match TripleProducer::produce_for_document(&doc) {
                    Err(e) => {
                        status.push(format!("{}\trefused\t{}\t0\t{:?}", name, rt, e));
                    }
                    Ok(triples) => {
                        let lines = canonical_lines(&triples);
                        let mut out = lines.join("\n");
                        out.push('\n');
                        fs::write(out_dir.join(format!("{}.tsv", flat)), out).unwrap();
                        status.push(format!(
                            "{}\tproduced\t{}\t{}\t-",
                            name,
                            rt,
                            lines.len()
                        ));
                    }
                }
            }
        }
    }

    let mut s = status.join("\n");
    s.push('\n');
    fs::write(out_dir.join("status.tsv"), s).unwrap();
    println!("done");
}

fn kind(e: &harriet::ParseError) -> &'static str {
    match e {
        harriet::ParseError::ParseError(_) => "parse_error",
        harriet::ParseError::NotFullyParsed(_) => "not_fully_parsed",
    }
}
