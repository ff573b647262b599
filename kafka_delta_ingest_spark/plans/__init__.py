"""Driver-side planners: metadata-only decisions (which files, which bins,
which salt factors) that shape the distributed plans. No row data ever
passes through this layer."""
