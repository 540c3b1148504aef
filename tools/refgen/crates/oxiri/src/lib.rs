//! Minimal offline subset of `oxiri` 0.2: `Iri::parse` + `Iri::resolve`.
//!
//! Resolution is RFC 3986 §5.2 (merge + remove_dot_segments + recomposition),
//! the same public algorithm the real oxiri implements. Validation is the
//! full RFC 3987 component grammar (written from the public RFC):
//! authority = [iuserinfo "@"] ihost [":" port] with IP-literal
//! (IPv6address / IPvFuture) host forms and ASCII-digit-only ports, ipchar
//! paths (colon-free first segment for relative references, per
//! ipath-noscheme), iquery with iprivate, ifragment without, ucschar code
//! point ranges, and `% HEXDIG HEXDIG` percent-encoding. The Scala
//! `graft.turtle.IriResolver` implements the identical rules so the
//! cross-engine fuzz exercises the same grammar on both sides.
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

// ---- RFC 3987 §2.2 component grammar (mirrors graft's IriResolver) ----

fn is_sub_delim(c: char) -> bool {
    matches!(c, '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ',' | ';' | '=')
}

fn is_unreserved_ascii(c: char) -> bool {
    c.is_ascii_alphanumeric() || matches!(c, '-' | '.' | '_' | '~')
}

/// RFC 3987 ucschar code point ranges.
fn is_ucschar(c: char) -> bool {
    let cp = c as u32;
    (0xA0..=0xD7FF).contains(&cp)
        || (0xF900..=0xFDCF).contains(&cp)
        || (0xFDF0..=0xFFEF).contains(&cp)
        || (cp >= 0x10000
            && (cp & 0xFFFF) <= 0xFFFD
            && ((cp >> 16) <= 0xD || cp >= 0xE1000)
            && cp <= 0xEFFFD)
}

/// RFC 3987 iprivate ranges (allowed in iquery ONLY).
fn is_iprivate(c: char) -> bool {
    let cp = c as u32;
    (0xE000..=0xF8FF).contains(&cp)
        || (0xF0000..=0xFFFFD).contains(&cp)
        || (0x100000..=0x10FFFD).contains(&cp)
}

fn is_iunreserved(c: char) -> bool {
    is_unreserved_ascii(c) || is_ucschar(c)
}

/// ipchar; '%' admitted here because pct-triplets are checked globally.
fn is_ipchar(c: char) -> bool {
    is_iunreserved(c) || c == '%' || is_sub_delim(c) || c == ':' || c == '@'
}

/// dec-octet: 0-255, no leading zeros.
fn is_dec_octet(s: &str) -> bool {
    !s.is_empty()
        && s.len() <= 3
        && s.chars().all(|c| c.is_ascii_digit())
        && (s.len() == 1 || !s.starts_with('0'))
        && s.parse::<u32>().map(|v| v <= 255).unwrap_or(false)
}

fn is_ipv4(s: &str) -> bool {
    let o: Vec<&str> = s.split('.').collect();
    o.len() == 4 && o.iter().all(|g| is_dec_octet(g))
}

fn is_h16(s: &str) -> bool {
    !s.is_empty() && s.len() <= 4 && s.chars().all(|c| c.is_ascii_hexdigit())
}

/// RFC 3986 IPv6address: 8 h16 groups (a trailing IPv4 counts as two), or
/// fewer with ONE "::" elision standing for at least one group.
fn is_ipv6(s: &str) -> bool {
    let dc = s.find("::");
    if let Some(i) = dc {
        if s[i + 2..].starts_with(':') || s[i + 2..].contains("::") {
            return false; // ":::" or a second "::"
        }
    }
    // (group count, last group was IPv4), None on malformed
    fn groups(part: &str) -> Option<(usize, bool)> {
        if part.is_empty() {
            return Some((0, false));
        }
        let gs: Vec<&str> = part.split(':').collect();
        if gs.iter().any(|g| g.is_empty()) {
            return None;
        }
        let (last, init) = gs.split_last().unwrap();
        if !init.iter().all(|g| is_h16(g)) {
            return None;
        }
        if is_ipv4(last) {
            Some((gs.len() + 1, true))
        } else if is_h16(last) {
            Some((gs.len(), false))
        } else {
            None
        }
    }
    match dc {
        Some(i) => match (groups(&s[..i]), groups(&s[i + 2..])) {
            // IPv4 must be the FINAL groups of the whole address
            (Some((nl, left_v4)), Some((nr, _))) => !left_v4 && nl + nr <= 7,
            _ => false,
        },
        None => groups(s).map(|(n, _)| n == 8).unwrap_or(false),
    }
}

/// IP-literal interior: IPv6address or IPvFuture.
fn is_ip_literal(inner: &str) -> bool {
    if inner.starts_with('v') || inner.starts_with('V') {
        match inner.find('.') {
            Some(dot) if dot >= 2 && dot + 1 < inner.len() => {
                inner[1..dot].chars().all(|c| c.is_ascii_hexdigit())
                    && inner[dot + 1..]
                        .chars()
                        .all(|c| is_unreserved_ascii(c) || is_sub_delim(c) || c == ':')
            }
            _ => false,
        }
    } else {
        is_ipv6(inner)
    }
}

/// `[iuserinfo "@"] ihost [":" port]` per RFC 3987 §2.2.
fn validate_authority(a: &str, s: &str) -> Result<(), IriParseError> {
    let (userinfo, host_port) = match a.find('@') {
        Some(i) => (&a[..i], &a[i + 1..]),
        None => ("", a),
    };
    if !userinfo
        .chars()
        .all(|c| is_iunreserved(c) || c == '%' || is_sub_delim(c) || c == ':')
    {
        return Err(IriParseError(format!("bad userinfo in IRI: {}", s)));
    }
    if let Some(rest) = host_port.strip_prefix('[') {
        let close = match rest.find(']') {
            Some(i) => i,
            None => return Err(IriParseError(format!("bad IP-literal host in IRI: {}", s))),
        };
        if !is_ip_literal(&rest[..close]) {
            return Err(IriParseError(format!("bad IP-literal host in IRI: {}", s)));
        }
        let after = &rest[close + 1..];
        let port_ok = after.is_empty()
            || (after.starts_with(':') && after[1..].chars().all(|c| c.is_ascii_digit()));
        if !port_ok {
            return Err(IriParseError(format!(
                "bad port after IP-literal in IRI: {}",
                s
            )));
        }
        Ok(())
    } else {
        let (host, port) = match host_port.find(':') {
            Some(i) => (&host_port[..i], &host_port[i + 1..]),
            None => (host_port, ""),
        };
        if !host
            .chars()
            .all(|c| is_iunreserved(c) || c == '%' || is_sub_delim(c))
        {
            return Err(IriParseError(format!("bad host in IRI: {}", s)));
        }
        if !port.chars().all(|c| c.is_ascii_digit()) {
            return Err(IriParseError(format!(
                "port must be ASCII digits in IRI: {}",
                s
            )));
        }
        Ok(())
    }
}

/// Full RFC 3987 grammar validation of a (possibly relative) reference,
/// component by component after the Appendix B split.
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
    let p = split(s);
    if let Some(a) = &p.authority {
        validate_authority(a, s)?;
    }
    if !p.path.chars().all(|c| is_ipchar(c) || c == '/') {
        return Err(IriParseError(format!("bad path character in IRI: {}", s)));
    }
    // ipath-noscheme: a relative reference's first segment cannot contain ':'
    if p.scheme.is_none()
        && p.authority.is_none()
        && !p.path.starts_with('/')
        && p.path.split('/').next().unwrap_or("").contains(':')
    {
        return Err(IriParseError(format!(
            "colon in first segment of relative path: {}",
            s
        )));
    }
    if let Some(q) = &p.query {
        if !q
            .chars()
            .all(|c| is_ipchar(c) || c == '/' || c == '?' || is_iprivate(c))
        {
            return Err(IriParseError(format!("bad query character in IRI: {}", s)));
        }
    }
    if let Some(f) = &p.fragment {
        if !f.chars().all(|c| is_ipchar(c) || c == '/' || c == '?') {
            return Err(IriParseError(format!(
                "bad fragment character in IRI: {}",
                s
            )));
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
