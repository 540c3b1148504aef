//! Minimal offline subset of `oxiri` 0.2: `Iri::parse` + `Iri::resolve`.
//!
//! Resolution is RFC 3986 §5.2 (merge + remove_dot_segments + recomposition),
//! the same public algorithm the real oxiri implements. Validation is an
//! approximation of oxiri's RFC 3987 grammar check: a base must carry a valid
//! scheme, and no component may contain characters outside the IRI character
//! set (space, control characters, and the `<>"{}|\^` ` set are rejected).
//! The reference only calls `Iri::parse` on `@base` IRIs and
//! `base.resolve(ref)` on IRIREF contents (triple_production.rs:247,341).

use std::fmt;

#[derive(Debug, Clone, PartialEq)]
pub struct IriParseError(String);

impl fmt::Display for IriParseError {
    fn fmt(&self, f: &mut fmt::Formatter<'_>) -> fmt::Result {
        write!(f, "invalid IRI: {}", self.0)
    }
}

impl std::error::Error for IriParseError {}

#[derive(Debug, Clone, PartialEq)]
pub struct Iri<T> {
    raw: T,
}

#[derive(Debug, Clone, Default)]
struct Parts {
    scheme: Option<String>,
    authority: Option<String>,
    path: String,
    query: Option<String>,
    fragment: Option<String>,
}

impl Parts {
    fn recompose(&self) -> String {
        let mut s = String::new();
        if let Some(sc) = &self.scheme {
            s.push_str(sc);
            s.push(':');
        }
        if let Some(a) = &self.authority {
            s.push_str("//");
            s.push_str(a);
        }
        s.push_str(&self.path);
        if let Some(q) = &self.query {
            s.push('?');
            s.push_str(q);
        }
        if let Some(f) = &self.fragment {
            s.push('#');
            s.push_str(f);
        }
        s
    }
}

fn is_scheme_like(s: &str) -> bool {
    let mut chars = s.chars();
    match chars.next() {
        Some(c) if c.is_ascii_alphabetic() => {}
        _ => return false,
    }
    chars.all(|c| c.is_ascii_alphanumeric() || c == '+' || c == '-' || c == '.')
}

/// RFC 3986 Appendix B split (never fails; validation is separate).
fn split(s: &str) -> Parts {
    let mut rest = s;
    let mut parts = Parts::default();

    if let Some(hash) = rest.find('#') {
        parts.fragment = Some(rest[hash + 1..].to_string());
        rest = &rest[..hash];
    }
    if let Some(qm) = rest.find('?') {
        parts.query = Some(rest[qm + 1..].to_string());
        rest = &rest[..qm];
    }
    if let Some(colon) = rest.find(':') {
        let candidate = &rest[..colon];
        if !candidate.is_empty()
            && !candidate.contains('/')
            && is_scheme_like(candidate)
        {
            parts.scheme = Some(candidate.to_string());
            rest = &rest[colon + 1..];
        }
    }
    if rest.starts_with("//") {
        let after = rest[2..]
            .find('/')
            .map(|i| i + 2)
            .unwrap_or(rest.len());
        parts.authority = Some(rest[2..after].to_string());
        rest = &rest[after..];
    }
    parts.path = rest.to_string();
    parts
}

/// Character-level IRI validation (approximates oxiri's RFC 3987 grammar
/// check): rejects characters that can never appear in a valid IRI, and
/// malformed percent-encoding (RFC 3986 §2.1: `%` must start `%HH`).
fn validate_chars(s: &str) -> Result<(), IriParseError> {
    for c in s.chars() {
        if c == ' '
            || c.is_control()
            || matches!(c, '<' | '>' | '"' | '{' | '}' | '|' | '\\' | '^' | '`')
        {
            return Err(IriParseError(format!(
                "character {:?} is not allowed in an IRI: {}",
                c, s
            )));
        }
    }
    let bytes = s.as_bytes();
    let mut i = 0;
    while i < bytes.len() {
        if bytes[i] == b'%' {
            if i + 2 >= bytes.len()
                || !bytes[i + 1].is_ascii_hexdigit()
                || !bytes[i + 2].is_ascii_hexdigit()
            {
                return Err(IriParseError(format!(
                    "malformed percent-encoding in IRI: {}",
                    s
                )));
            }
            i += 3;
        } else {
            i += 1;
        }
    }
    Ok(())
}

/// RFC 3986 §5.2.3
fn merge(base: &Parts, ref_path: &str) -> String {
    if base.authority.is_some() && base.path.is_empty() {
        format!("/{}", ref_path)
    } else {
        match base.path.rfind('/') {
            Some(i) => format!("{}{}", &base.path[..i + 1], ref_path),
            None => ref_path.to_string(),
        }
    }
}

/// RFC 3986 §5.2.4
fn remove_dot_segments(path: &str) -> String {
    let mut out: Vec<String> = Vec::new();
    let mut inp = path.to_string();
    while !inp.is_empty() {
        if inp.starts_with("../") {
            inp = inp[3..].to_string();
        } else if inp.starts_with("./") {
            inp = inp[2..].to_string();
        } else if inp.starts_with("/./") {
            inp = format!("/{}", &inp[3..]);
        } else if inp == "/." {
            inp = "/".to_string();
        } else if inp.starts_with("/../") {
            inp = format!("/{}", &inp[4..]);
            out.pop();
        } else if inp == "/.." {
            inp = "/".to_string();
            out.pop();
        } else if inp == "." || inp == ".." {
            inp = String::new();
        } else {
            let start = if inp.starts_with('/') { 1 } else { 0 };
            match inp[start..].find('/') {
                Some(next) => {
                    let next = next + start;
                    out.push(inp[..next].to_string());
                    inp = inp[next..].to_string();
                }
                None => {
                    out.push(inp.clone());
                    inp = String::new();
                }
            }
        }
    }
    out.concat()
}

impl<T: AsRef<str>> Iri<T> {
    /// Parses an ABSOLUTE IRI (scheme required), validating characters.
    pub fn parse(iri: T) -> Result<Self, IriParseError> {
        validate_chars(iri.as_ref())?;
        let parts = split(iri.as_ref());
        if parts.scheme.is_none() {
            return Err(IriParseError(format!(
                "no scheme in base IRI: {}",
                iri.as_ref()
            )));
        }
        Ok(Iri { raw: iri })
    }

    pub fn as_str(&self) -> &str {
        self.raw.as_ref()
    }

    /// RFC 3986 §5.2.2 transform-references against `self` as base.
    pub fn resolve(&self, reference: &str) -> Result<Iri<String>, IriParseError> {
        validate_chars(reference)?;
        let base = split(self.raw.as_ref());
        let r = split(reference);
        let t = if r.scheme.is_some() {
            Parts {
                scheme: r.scheme,
                authority: r.authority,
                path: remove_dot_segments(&r.path),
                query: r.query,
                fragment: r.fragment,
            }
        } else if r.authority.is_some() {
            Parts {
                scheme: base.scheme,
                authority: r.authority,
                path: remove_dot_segments(&r.path),
                query: r.query,
                fragment: r.fragment,
            }
        } else if r.path.is_empty() {
            Parts {
                scheme: base.scheme,
                authority: base.authority,
                path: base.path,
                query: if r.query.is_some() { r.query } else { base.query },
                fragment: r.fragment,
            }
        } else if r.path.starts_with('/') {
            Parts {
                scheme: base.scheme,
                authority: base.authority,
                path: remove_dot_segments(&r.path),
                query: r.query,
                fragment: r.fragment,
            }
        } else {
            let merged = remove_dot_segments(&merge(&base, &r.path));
            Parts {
                scheme: base.scheme,
                authority: base.authority,
                path: merged,
                query: r.query,
                fragment: r.fragment,
            }
        };
        Ok(Iri { raw: t.recompose() })
    }
}
