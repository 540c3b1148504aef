//! Minimal offline subset of cookie-factory 0.3 used by the reference crate:
//! `SerializeFn`, `gen`, `combinator::string`, `multi::{all, separated_list}`,
//! `sequence::tuple`, and the `lib::std` re-export. Serializers are plain
//! `Fn(WriteContext<W>) -> Result<WriteContext<W>, GenError>` closures.

use std::io::Write;

#[derive(Debug)]
pub enum GenError {
    IoError(std::io::Error),
}

pub struct WriteContext<W> {
    pub write: W,
    pub position: u64,
}

pub type GenResult<W> = Result<WriteContext<W>, GenError>;

pub trait SerializeFn<W>: Fn(WriteContext<W>) -> GenResult<W> {}
impl<W, F: Fn(WriteContext<W>) -> GenResult<W>> SerializeFn<W> for F {}

/// Runs the serializer against `w`, returning the writer and bytes written.
pub fn gen<W: Write, F: SerializeFn<W>>(f: F, w: W) -> Result<(W, u64), GenError> {
    let ctx = WriteContext { write: w, position: 0 };
    let out = f(ctx)?;
    Ok((out.write, out.position))
}

pub mod combinator {
    use super::{GenError, GenResult, SerializeFn, WriteContext};
    use std::io::Write;

    pub fn string<S: AsRef<str>, W: Write>(data: S) -> impl SerializeFn<W> {
        move |mut ctx: WriteContext<W>| {
            let bytes = data.as_ref().as_bytes();
            ctx.write.write_all(bytes).map_err(GenError::IoError)?;
            ctx.position += bytes.len() as u64;
            Ok(ctx)
        }
    }

    pub fn gen_unit<W: Write>() -> impl SerializeFn<W> {
        move |ctx: WriteContext<W>| -> GenResult<W> { Ok(ctx) }
    }
}

pub mod multi {
    use super::{GenResult, SerializeFn, WriteContext};
    use std::io::Write;

    /// Applies every serializer from the iterator in order.
    pub fn all<G, W: Write, It>(values: It) -> impl SerializeFn<W>
    where
        G: SerializeFn<W>,
        It: IntoIterator<Item = G> + Clone,
    {
        move |mut ctx: WriteContext<W>| -> GenResult<W> {
            for v in values.clone() {
                ctx = v(ctx)?;
            }
            Ok(ctx)
        }
    }

    /// Applies serializers from the iterator with `sep` between them.
    pub fn separated_list<F, G, W: Write, It>(sep: F, values: It) -> impl SerializeFn<W>
    where
        F: SerializeFn<W>,
        G: SerializeFn<W>,
        It: IntoIterator<Item = G> + Clone,
    {
        move |mut ctx: WriteContext<W>| -> GenResult<W> {
            let mut first = true;
            for v in values.clone() {
                if !first {
                    ctx = sep(ctx)?;
                }
                first = false;
                ctx = v(ctx)?;
            }
            Ok(ctx)
        }
    }
}

pub mod sequence {
    use super::{GenResult, SerializeFn, WriteContext};
    use std::io::Write;

    pub trait Tuple<W> {
        fn serialize(&self, ctx: WriteContext<W>) -> GenResult<W>;
    }

    macro_rules! tuple_impl {
        ($($id:ident : $idx:tt),+) => {
            impl<W: Write, $($id: SerializeFn<W>),+> Tuple<W> for ($($id,)+) {
                fn serialize(&self, mut ctx: WriteContext<W>) -> GenResult<W> {
                    $( ctx = (self.$idx)(ctx)?; )+
                    Ok(ctx)
                }
            }
        };
    }

    tuple_impl!(A: 0);
    tuple_impl!(A: 0, B: 1);
    tuple_impl!(A: 0, B: 1, C: 2);
    tuple_impl!(A: 0, B: 1, C: 2, D: 3);
    tuple_impl!(A: 0, B: 1, C: 2, D: 3, F: 4);
    tuple_impl!(A: 0, B: 1, C: 2, D: 3, F: 4, G: 5);
    tuple_impl!(A: 0, B: 1, C: 2, D: 3, F: 4, G: 5, H: 6);
    tuple_impl!(A: 0, B: 1, C: 2, D: 3, F: 4, G: 5, H: 6, J: 7);
    tuple_impl!(A: 0, B: 1, C: 2, D: 3, F: 4, G: 5, H: 6, J: 7, K: 8);
    tuple_impl!(A: 0, B: 1, C: 2, D: 3, F: 4, G: 5, H: 6, J: 7, K: 8, L: 9);

    pub fn tuple<W: Write, List: Tuple<W>>(l: List) -> impl SerializeFn<W> {
        move |ctx: WriteContext<W>| l.serialize(ctx)
    }
}

/// cookie-factory re-exports `std` under `lib` for no_std support; the
/// reference imports `cookie_factory::lib::std::io::Write`.
pub mod lib {
    pub mod std {
        pub use std::*;
        pub mod io {
            pub use std::io::*;
        }
    }
}
