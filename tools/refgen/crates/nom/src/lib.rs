//! Minimal offline re-implementation of the subset of nom 7 used by the
//! reference crate (harriet). Written from the public nom 7.x documentation
//! semantics so the reference's own grammar code can run unmodified in this
//! no-network sandbox. Only `&str` input is supported (all harriet parsers
//! are `&str -> IResult<&str, _>`).
//!
//! Semantics intentionally mirrored from nom 7:
//! - `alt` tries alternatives in order; `Err::Error` backtracks, anything
//!   else propagates; the last error wins (combined via `ParseError::or`).
//! - `many0`/`many1` stop on `Err::Error`; an inner parser that succeeds
//!   without consuming input yields `ErrorKind::Many0`/`Many1` to prevent
//!   infinite loops.
//! - `opt` converts `Err::Error` to `None`, propagates `Err::Failure`/
//!   `Err::Incomplete`.
//! - `*1` character parsers fail on zero matches with their documented
//!   ErrorKind; `take_till` never fails.

use std::num::NonZeroUsize;

#[derive(Debug, Clone, PartialEq)]
pub enum Needed {
    Unknown,
    Size(NonZeroUsize),
}

#[derive(Debug, Clone, PartialEq)]
pub enum Err<E> {
    Incomplete(Needed),
    Error(E),
    Failure(E),
}

pub type IResult<I, O, E = error::Error<I>> = Result<(I, O), Err<E>>;

pub mod error {
    #[derive(Debug, Clone, Copy, PartialEq, Eq)]
    pub enum ErrorKind {
        Tag,
        IsNot,
        TakeWhile1,
        TakeTill1,
        Alpha,
        AlphaNumeric,
        Char,
        MultiSpace,
        Satisfy,
        Many0,
        Many1,
        Alt,
        MapRes,
        Eof,
        Fail,
    }

    pub trait ParseError<I>: Sized {
        fn from_error_kind(input: I, kind: ErrorKind) -> Self;
        fn append(input: I, kind: ErrorKind, other: Self) -> Self;
        fn from_char(input: I, _: char) -> Self {
            Self::from_error_kind(input, ErrorKind::Char)
        }
        fn or(self, other: Self) -> Self {
            other
        }
    }

    pub trait FromExternalError<I, E> {
        fn from_external_error(input: I, kind: ErrorKind, e: E) -> Self;
    }

    #[derive(Debug, Clone, PartialEq)]
    pub struct Error<I> {
        pub input: I,
        pub code: ErrorKind,
    }

    impl<I> ParseError<I> for Error<I> {
        fn from_error_kind(input: I, kind: ErrorKind) -> Self {
            Error { input, code: kind }
        }
        fn append(_input: I, _kind: ErrorKind, other: Self) -> Self {
            other
        }
    }

    impl<I, E> FromExternalError<I, E> for Error<I> {
        fn from_external_error(input: I, kind: ErrorKind, _e: E) -> Self {
            Error { input, code: kind }
        }
    }

    #[derive(Debug, Clone, PartialEq)]
    pub enum VerboseErrorKind {
        Context(&'static str),
        Char(char),
        Nom(ErrorKind),
    }

    #[derive(Debug, Clone, PartialEq)]
    pub struct VerboseError<I> {
        pub errors: Vec<(I, VerboseErrorKind)>,
    }

    impl<I> ParseError<I> for VerboseError<I> {
        fn from_error_kind(input: I, kind: ErrorKind) -> Self {
            VerboseError {
                errors: vec![(input, VerboseErrorKind::Nom(kind))],
            }
        }
        fn append(input: I, kind: ErrorKind, mut other: Self) -> Self {
            other.errors.push((input, VerboseErrorKind::Nom(kind)));
            other
        }
        fn from_char(input: I, c: char) -> Self {
            VerboseError {
                errors: vec![(input, VerboseErrorKind::Char(c))],
            }
        }
    }

    impl<I, E> FromExternalError<I, E> for VerboseError<I> {
        fn from_external_error(input: I, kind: ErrorKind, _e: E) -> Self {
            Self::from_error_kind(input, kind)
        }
    }
}

pub mod branch {
    use super::error::{ErrorKind, ParseError};
    use super::{Err, IResult};

    pub trait Alt<I, O, E> {
        fn choice(&mut self, input: I) -> IResult<I, O, E>;
    }

    macro_rules! alt_impl {
        ($($id:ident : $idx:tt),+) => {
            impl<'a, O, E: ParseError<&'a str>, $($id: FnMut(&'a str) -> IResult<&'a str, O, E>),+>
                Alt<&'a str, O, E> for ($($id,)+)
            {
                fn choice(&mut self, input: &'a str) -> IResult<&'a str, O, E> {
                    let mut err: Option<E> = None;
                    $(
                        match (self.$idx)(input) {
                            Err(Err::Error(e)) => {
                                err = Some(match err {
                                    Some(prev) => prev.or(e),
                                    None => e,
                                });
                            }
                            res => return res,
                        }
                    )+
                    Err(Err::Error(E::append(
                        input,
                        ErrorKind::Alt,
                        err.unwrap(),
                    )))
                }
            }
        };
    }

    alt_impl!(A: 0);
    alt_impl!(A: 0, B: 1);
    alt_impl!(A: 0, B: 1, C: 2);
    alt_impl!(A: 0, B: 1, C: 2, D: 3);
    alt_impl!(A: 0, B: 1, C: 2, D: 3, F: 4);
    alt_impl!(A: 0, B: 1, C: 2, D: 3, F: 4, G: 5);
    alt_impl!(A: 0, B: 1, C: 2, D: 3, F: 4, G: 5, H: 6);
    alt_impl!(A: 0, B: 1, C: 2, D: 3, F: 4, G: 5, H: 6, J: 7);

    pub fn alt<'a, O, E, List>(mut l: List) -> impl FnMut(&'a str) -> IResult<&'a str, O, E>
    where
        E: ParseError<&'a str>,
        List: Alt<&'a str, O, E>,
    {
        move |i: &'a str| l.choice(i)
    }
}

pub mod bytes {
    pub mod complete {
        use crate::error::{ErrorKind, ParseError};
        use crate::{Err, IResult};

        /// Matches the literal `t` at the head of the input.
        pub fn tag<'a, E: ParseError<&'a str>>(
            t: &'static str,
        ) -> impl Fn(&'a str) -> IResult<&'a str, &'a str, E> {
            move |i: &'a str| {
                if i.starts_with(t) {
                    Ok((&i[t.len()..], &i[..t.len()]))
                } else {
                    Err(Err::Error(E::from_error_kind(i, ErrorKind::Tag)))
                }
            }
        }

        /// Takes 1+ chars not in `chars`; errors on zero.
        pub fn is_not<'a, E: ParseError<&'a str>>(
            chars: &'static str,
        ) -> impl Fn(&'a str) -> IResult<&'a str, &'a str, E> {
            move |i: &'a str| {
                let end = i
                    .char_indices()
                    .find(|(_, c)| chars.contains(*c))
                    .map(|(idx, _)| idx)
                    .unwrap_or(i.len());
                if end == 0 {
                    Err(Err::Error(E::from_error_kind(i, ErrorKind::IsNot)))
                } else {
                    Ok((&i[end..], &i[..end]))
                }
            }
        }

        /// Takes 0+ chars until `pred` is true; never fails.
        pub fn take_till<'a, E: ParseError<&'a str>, P: Fn(char) -> bool>(
            pred: P,
        ) -> impl Fn(&'a str) -> IResult<&'a str, &'a str, E> {
            move |i: &'a str| {
                let end = i
                    .char_indices()
                    .find(|(_, c)| pred(*c))
                    .map(|(idx, _)| idx)
                    .unwrap_or(i.len());
                Ok((&i[end..], &i[..end]))
            }
        }

        /// Takes 1+ chars while `pred` is true; errors on zero.
        pub fn take_while1<'a, E: ParseError<&'a str>, P: Fn(char) -> bool>(
            pred: P,
        ) -> impl Fn(&'a str) -> IResult<&'a str, &'a str, E> {
            move |i: &'a str| {
                let end = i
                    .char_indices()
                    .find(|(_, c)| !pred(*c))
                    .map(|(idx, _)| idx)
                    .unwrap_or(i.len());
                if end == 0 {
                    Err(Err::Error(E::from_error_kind(i, ErrorKind::TakeWhile1)))
                } else {
                    Ok((&i[end..], &i[..end]))
                }
            }
        }
    }
}

pub mod character {
    pub mod complete {
        use crate::error::{ErrorKind, ParseError};
        use crate::{Err, IResult};

        fn take_while1_kind<'a, E: ParseError<&'a str>>(
            i: &'a str,
            pred: impl Fn(char) -> bool,
            kind: ErrorKind,
        ) -> IResult<&'a str, &'a str, E> {
            let end = i
                .char_indices()
                .find(|(_, c)| !pred(*c))
                .map(|(idx, _)| idx)
                .unwrap_or(i.len());
            if end == 0 {
                Err(Err::Error(E::from_error_kind(i, kind)))
            } else {
                Ok((&i[end..], &i[..end]))
            }
        }

        pub fn alpha1<'a, E: ParseError<&'a str>>(i: &'a str) -> IResult<&'a str, &'a str, E> {
            take_while1_kind(i, |c| c.is_ascii_alphabetic(), ErrorKind::Alpha)
        }

        pub fn alphanumeric1<'a, E: ParseError<&'a str>>(
            i: &'a str,
        ) -> IResult<&'a str, &'a str, E> {
            take_while1_kind(i, |c| c.is_ascii_alphanumeric(), ErrorKind::AlphaNumeric)
        }

        pub fn multispace1<'a, E: ParseError<&'a str>>(i: &'a str) -> IResult<&'a str, &'a str, E> {
            take_while1_kind(
                i,
                |c| c == ' ' || c == '\t' || c == '\r' || c == '\n',
                ErrorKind::MultiSpace,
            )
        }

        pub fn char<'a, E: ParseError<&'a str>>(
            c: char,
        ) -> impl Fn(&'a str) -> IResult<&'a str, char, E> {
            move |i: &'a str| match i.chars().next() {
                Some(first) if first == c => Ok((&i[c.len_utf8()..], c)),
                _ => Err(Err::Error(E::from_char(i, c))),
            }
        }

        pub fn satisfy<'a, E: ParseError<&'a str>, P: Fn(char) -> bool>(
            pred: P,
        ) -> impl Fn(&'a str) -> IResult<&'a str, char, E> {
            move |i: &'a str| match i.chars().next() {
                Some(first) if pred(first) => Ok((&i[first.len_utf8()..], first)),
                _ => Err(Err::Error(E::from_error_kind(i, ErrorKind::Satisfy))),
            }
        }
    }
}

pub mod combinator {
    use super::error::ParseError;
    use super::{Err, IResult};

    pub fn map<'a, O1, O2, E, F, G>(
        mut parser: F,
        mut f: G,
    ) -> impl FnMut(&'a str) -> IResult<&'a str, O2, E>
    where
        F: FnMut(&'a str) -> IResult<&'a str, O1, E>,
        G: FnMut(O1) -> O2,
    {
        move |i: &'a str| parser(i).map(|(rest, o)| (rest, f(o)))
    }

    pub fn opt<'a, O, E: ParseError<&'a str>, F>(
        mut parser: F,
    ) -> impl FnMut(&'a str) -> IResult<&'a str, Option<O>, E>
    where
        F: FnMut(&'a str) -> IResult<&'a str, O, E>,
    {
        move |i: &'a str| match parser(i) {
            Ok((rest, o)) => Ok((rest, Some(o))),
            Err(Err::Error(_)) => Ok((i, None)),
            Err(e) => Err(e),
        }
    }
}

pub mod multi {
    use super::error::{ErrorKind, ParseError};
    use super::{Err, IResult};

    pub fn many0<'a, O, E: ParseError<&'a str>, F>(
        mut parser: F,
    ) -> impl FnMut(&'a str) -> IResult<&'a str, Vec<O>, E>
    where
        F: FnMut(&'a str) -> IResult<&'a str, O, E>,
    {
        move |mut i: &'a str| {
            let mut acc = Vec::new();
            loop {
                match parser(i) {
                    Ok((rest, o)) => {
                        if rest.len() == i.len() {
                            return Err(Err::Error(E::from_error_kind(i, ErrorKind::Many0)));
                        }
                        acc.push(o);
                        i = rest;
                    }
                    Err(Err::Error(_)) => return Ok((i, acc)),
                    Err(e) => return Err(e),
                }
            }
        }
    }

    pub fn many1<'a, O, E: ParseError<&'a str>, F>(
        mut parser: F,
    ) -> impl FnMut(&'a str) -> IResult<&'a str, Vec<O>, E>
    where
        F: FnMut(&'a str) -> IResult<&'a str, O, E>,
    {
        move |mut i: &'a str| {
            let mut acc = Vec::new();
            match parser(i) {
                Ok((rest, o)) => {
                    acc.push(o);
                    i = rest;
                }
                Err(Err::Error(e)) => {
                    return Err(Err::Error(E::append(i, ErrorKind::Many1, e)))
                }
                Err(e) => return Err(e),
            }
            loop {
                match parser(i) {
                    Ok((rest, o)) => {
                        if rest.len() == i.len() {
                            return Err(Err::Error(E::from_error_kind(i, ErrorKind::Many1)));
                        }
                        acc.push(o);
                        i = rest;
                    }
                    Err(Err::Error(_)) => return Ok((i, acc)),
                    Err(e) => return Err(e),
                }
            }
        }
    }
}

pub mod sequence {
    use super::error::ParseError;
    use super::IResult;

    pub fn delimited<'a, O1, O2, O3, E: ParseError<&'a str>, F, G, H>(
        mut first: F,
        mut second: G,
        mut third: H,
    ) -> impl FnMut(&'a str) -> IResult<&'a str, O2, E>
    where
        F: FnMut(&'a str) -> IResult<&'a str, O1, E>,
        G: FnMut(&'a str) -> IResult<&'a str, O2, E>,
        H: FnMut(&'a str) -> IResult<&'a str, O3, E>,
    {
        move |i: &'a str| {
            let (i, _) = first(i)?;
            let (i, o) = second(i)?;
            let (i, _) = third(i)?;
            Ok((i, o))
        }
    }

    pub trait Tuple<I, O, E> {
        fn parse(&mut self, input: I) -> IResult<I, O, E>;
    }

    macro_rules! tuple_impl {
        ($($id:ident $oty:ident : $idx:tt),+) => {
            impl<'a, E: ParseError<&'a str>, $($oty),+, $($id: FnMut(&'a str) -> IResult<&'a str, $oty, E>),+>
                Tuple<&'a str, ($($oty,)+), E> for ($($id,)+)
            {
                fn parse(&mut self, input: &'a str) -> IResult<&'a str, ($($oty,)+), E> {
                    let i = input;
                    $(
                        #[allow(non_snake_case)]
                        let (i, $oty) = (self.$idx)(i)?;
                    )+
                    Ok((i, ($($oty,)+)))
                }
            }
        };
    }

    tuple_impl!(A OA: 0);
    tuple_impl!(A OA: 0, B OB: 1);
    tuple_impl!(A OA: 0, B OB: 1, C OC: 2);
    tuple_impl!(A OA: 0, B OB: 1, C OC: 2, D OD: 3);
    tuple_impl!(A OA: 0, B OB: 1, C OC: 2, D OD: 3, F OF: 4);
    tuple_impl!(A OA: 0, B OB: 1, C OC: 2, D OD: 3, F OF: 4, G OG: 5);
    tuple_impl!(A OA: 0, B OB: 1, C OC: 2, D OD: 3, F OF: 4, G OG: 5, H OH: 6);
    tuple_impl!(A OA: 0, B OB: 1, C OC: 2, D OD: 3, F OF: 4, G OG: 5, H OH: 6, J OJ: 7);
    tuple_impl!(A OA: 0, B OB: 1, C OC: 2, D OD: 3, F OF: 4, G OG: 5, H OH: 6, J OJ: 7, K OK: 8);
    tuple_impl!(A OA: 0, B OB: 1, C OC: 2, D OD: 3, F OF: 4, G OG: 5, H OH: 6, J OJ: 7, K OK: 8, L OL: 9);

    pub fn tuple<'a, O, E, List>(mut l: List) -> impl FnMut(&'a str) -> IResult<&'a str, O, E>
    where
        E: ParseError<&'a str>,
        List: Tuple<&'a str, O, E>,
    {
        move |i: &'a str| l.parse(i)
    }
}
