//! Minimal offline subset of the `snowflake` crate: `ProcessUniqueId` as a
//! process-global monotonically increasing id (single-process harness — the
//! real crate's per-thread prefixing is irrelevant here; only uniqueness and
//! allocation ORDER within one thread matter for golden generation).

use std::sync::atomic::{AtomicU64, Ordering};

static NEXT: AtomicU64 = AtomicU64::new(0);

#[derive(Debug, Clone, Copy, PartialEq, Eq, Hash, PartialOrd, Ord)]
pub struct ProcessUniqueId(u64);

impl ProcessUniqueId {
    pub fn new() -> Self {
        ProcessUniqueId(NEXT.fetch_add(1, Ordering::Relaxed))
    }
}

impl Default for ProcessUniqueId {
    fn default() -> Self {
        Self::new()
    }
}

impl std::fmt::Display for ProcessUniqueId {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        write!(f, "puid{}", self.0)
    }
}
