//! Dev-dependency placeholder so the reference's lockfile resolves offline.
//! Falls back to std's assert macros (no pretty diffs needed here — the
//! reference's inline tests are not executed by this harness).

#[macro_export]
macro_rules! assert_eq {
    ($($arg:tt)*) => { ::std::assert_eq!($($arg)*) };
}

#[macro_export]
macro_rules! assert_ne {
    ($($arg:tt)*) => { ::std::assert_ne!($($arg)*) };
}
