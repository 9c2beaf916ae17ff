"""Checkpoint / resume manifest for multi-chromosome runs.

The reference writes its TSV incrementally per chromosome, so a crashed run
can only be resumed by manually re-running the missing chromosomes
(SURVEY.md section 5). Here that contract is explicit: each completed
(chromosome, config-fingerprint) unit is recorded in ``<out>.manifest.json``
together with its atomically-written partial output
(``<out>.part.<chrom>``); re-entry skips completed units and the final
output is assembled by concatenation. Fault domains are per chromosome —
a crash loses at most the chromosome in flight.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import tempfile


def config_fingerprint(cfg, extra: dict | None = None) -> str:
    payload = {k: getattr(cfg, k) for k in (
        "resolution", "distance_bp", "pt", "pt2", "st", "sigma0", "octaves",
        "precision")}
    if extra:
        payload.update(extra)
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


@dataclasses.dataclass
class RunManifest:
    out_path: str
    fingerprint: str

    @property
    def manifest_path(self) -> str:
        return self.out_path + ".manifest.json"

    def _load(self) -> dict:
        if os.path.exists(self.manifest_path):
            data = json.load(open(self.manifest_path))
            if data.get("fingerprint") == self.fingerprint:
                return data
        return {"fingerprint": self.fingerprint, "completed": {}}

    def completed_chromosomes(self) -> set[str]:
        return set(self._load()["completed"])

    def part_path(self, chrom: str) -> str:
        return f"{self.out_path}.part.{chrom}"

    def mark_complete(self, chrom: str, n_loops: int, seconds: float,
                      rows: str):
        """Atomically write the chromosome's rows and record completion."""
        part = self.part_path(chrom)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(part) or ".",
                                   prefix=os.path.basename(part))
        with os.fdopen(fd, "w") as fh:
            fh.write(rows)
        os.replace(tmp, part)

        data = self._load()
        data["completed"][chrom] = {"n_loops": n_loops,
                                    "seconds": round(seconds, 2)}
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.manifest_path) or ".",
            prefix=os.path.basename(self.manifest_path))
        with os.fdopen(fd, "w") as fh:
            json.dump(data, fh, indent=1)
        os.replace(tmp, self.manifest_path)

    def assemble(self, chrom_order, header: str):
        """Concatenate completed parts into the final output, in order."""
        with open(self.out_path, "w") as out:
            out.write(header)
            for chrom in chrom_order:
                part = self.part_path(chrom)
                if os.path.exists(part):
                    with open(part) as fh:
                        out.write(fh.read())

    def cleanup(self, chrom_order):
        for chrom in chrom_order:
            part = self.part_path(chrom)
            if os.path.exists(part):
                os.remove(part)
        if os.path.exists(self.manifest_path):
            os.remove(self.manifest_path)
