"""Greedy bin-packing planner for small-file compaction.

Generalizes the reference's file-size targeting — buffer until
``min_bytes_per_file`` then cut a file (/root/reference/src/lib.rs:1127-1145,
default 128 MiB src/lib.rs:311; design doc "parquet sizes as large as
possible", doc/DESIGN.md:58-62) — into batch bin-packing: group undersized
live files, per hive partition, into bins of ~``target_file_bytes``.

Driver-side metadata work: O(n_files log n_files). Deterministic for a
given file list (sorted inputs), which the resume ledger relies on."""

from __future__ import annotations

from dataclasses import dataclass, field

from kafka_delta_ingest_spark.table.format import FileEntry

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # ref src/lib.rs:311


@dataclass
class Bin:
    bin_id: int
    partition_values: dict[str, str]
    files: list[FileEntry] = field(default_factory=list)

    @property
    def size(self) -> int:
        return sum(f.size for f in self.files)

    @property
    def num_records(self) -> int:
        return sum(f.num_records for f in self.files)

    def input_paths(self) -> list[str]:
        return sorted(f.path for f in self.files)


def plan_bins(
    files: list[FileEntry],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_threshold: float = 0.75,
    min_files_per_bin: int = 2,
) -> list[Bin]:
    """First-fit-decreasing within each hive partition.

    Candidates = files < small_file_threshold * target (already-right-sized
    files are never rewritten). Bins holding < min_files_per_bin files are
    dropped — rewriting a lone small file buys nothing.
    """
    threshold = int(target_file_bytes * small_file_threshold)
    by_part: dict[tuple, list[FileEntry]] = {}
    for f in files:
        if f.size < threshold:
            key = tuple(sorted(f.partition_values.items()))
            by_part.setdefault(key, []).append(f)

    bins: list[Bin] = []
    next_id = 0
    for key in sorted(by_part):
        cand = sorted(by_part[key], key=lambda f: (-f.size, f.path))
        open_bins: list[Bin] = []
        for f in cand:
            placed = False
            for b in open_bins:
                if b.size + f.size <= target_file_bytes:
                    b.files.append(f)
                    placed = True
                    break
            if not placed:
                b = Bin(bin_id=next_id, partition_values=dict(key), files=[f])
                next_id += 1
                open_bins.append(b)
        bins.extend(b for b in open_bins if len(b.files) >= min_files_per_bin)
    # renumber densely & deterministically
    bins.sort(key=lambda b: (sorted(b.partition_values.items()), b.input_paths()))
    for i, b in enumerate(bins):
        b.bin_id = i
    return bins
