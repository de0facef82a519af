"""Full Pippenger pipeline end-to-end (pippenger.rs:621-645 pattern):
prove + verify + recombined-output-vs-true-MSM equality."""
import random

import pytest

from gkr_msm_tpu.models.pippenger import (
    build_pippenger_data,
    run_pippenger,
    verify_pippenger,
)
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.utils.transcript import Transcript


@pytest.mark.parametrize(
    "d_logsize,x_logsize,num_bits,clm",
    [
        (2, 4, 8, 1),   # y_size=4 (power of two), y_logsize=2
        (2, 4, 10, 1),  # y_size=5 (ragged), y_logsize=3
    ],
)
def test_pippenger_end_to_end(d_logsize, x_logsize, num_bits, clm):
    rng = random.Random(0x5EED ^ (d_logsize << 8) ^ num_bits)
    data = build_pippenger_data(rng, d_logsize, x_logsize, num_bits, clm)
    config = data.config

    expected = bs.Host.msm(data.coefs, data.points)

    tr = Transcript(b"pippenger-e2e")
    output = run_pippenger(tr, data)
    proof = tr.end()

    tv = Transcript(b"pippenger-e2e", proof=proof)
    got = verify_pippenger(tv, config, output, expected_msm=expected)
    tv.assert_end()
    assert got == expected
