"""Version-diff QC sampling: planted added/changed rows are classified and
sampled exactly as the splitmix64 threshold dictates — reference semantics
/root/reference/src/diff-sampling/diff-search.py:48-90."""

import numpy as np
import pandas as pd

from scripts_ray.ops import sampling
from scripts_ray.ops.dedup import sql_mix64


def test_corpus_diff_sample_classification(ray_session):
    import ray.data as rd

    n = 400
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"doc body {i}" for i in range(n)],
            "source": np.where(np.arange(n) % 2 == 0, "src0", "src1"),
        }
    )
    got = (
        sampling.corpus_diff_sample(lambda: rd.from_pandas(docs.copy()))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    ids = docs["doc_id"].to_numpy()
    added = ids % sampling.DIFF_ADD_MOD == 0
    changed = ~added & (ids % sampling.DIFF_CHG_MOD == 0)
    z = sql_mix64(ids * 2 + sampling.DIFF_SALT) % np.uint64(100)
    keep = (added & (z < sampling.DIFF_RATE_ADDED)) | (
        changed & (z < sampling.DIFF_RATE_CHANGED)
    )
    exp = pd.DataFrame(
        {
            "doc_id": ids[keep],
            "source": docs["source"].to_numpy()[keep],
            "status": np.where(added, "added", "changed")[keep],
        }
    )
    assert len(got) > 0  # the derivation plants both strata at n=400
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True),
                                  check_dtype=False)
    assert set(got["status"]) == {"added", "changed"}
