"""Pre-clean an address table and persist it as resumable partitioned
Parquet — the reference's examples/preclean_full_os.py flow (clean once,
write, reuse across matching runs).

Run:  PYTHONPATH=. python examples/preclean_corpus.py /tmp/precleaned_out
"""

from __future__ import annotations

import sys


def main(out_dir: str = "/tmp/uam_precleaned", n: int = 500, verbose: bool = True):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from examples._example_data import make_canonical
    from moj_analytical_services_uk_address_matcher_ray.pipelines.clean import clean_dataset
    from moj_analytical_services_uk_address_matcher_ray.pipelines.framework import (
        DebugOptions,
        Pipeline,
        stage,
    )
    from moj_analytical_services_uk_address_matcher_ray.sources.io import (
        write_parquet_with_manifest,
    )

    clean = stage("clean", description="full cleaning pipeline")(clean_dataset)
    pipe = Pipeline([clean], name="preclean")
    cleaned = pipe.run(
        rd.from_arrow(make_canonical(n)),
        debug=DebugOptions(materialize_each_stage=True, row_counts=True),
    )
    manifest = write_parquet_with_manifest(cleaned, out_dir)
    if verbose:
        print(pipe.report())
        print(f"wrote {manifest['rows']} rows / {len(manifest['files'])} files "
              f"to {out_dir} (re-running skips via _MANIFEST.json)")
    return manifest


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/uam_precleaned")
