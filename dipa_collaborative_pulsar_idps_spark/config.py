"""Detection thresholds and cadence constants.

Every constant is lifted from the reference (cited) so query semantics are
reproducible. Kept as plain config → Catalyst constant-folds literals.

Reference citations (paths relative to /root/reference):
- PKT_RATE_THRESHOLD 25 pkt/s:  ryu/testing/experimental_development/TestCase_5/timeStamp.py:300-308
- BIAS_THRESHOLD 0.6:           ryu/src/deployed_controller/DIPA_Controller.py:497
- COMPROMISE_PCT 50:            ryu/src/deployed_controller/DIPA_Controller.py:351
- ATTACK_THRESHOLD 4000 Kbit/s: ryu/testing/experimental_development/TestCase_2/Controller1.py:83-97
- ATTACKER_THRESHOLD 1000:      same
- PEACE_THRESHOLD 10:           same
- PORT_FLOOD_PKTS 1000:         ryu/testing/experimental_development/TestCase_3/TesCase2.py:95-98
- SUSTAINED_COUNT 5:            ryu/testing/experimental_development/TestCase_2/Controller1.py:93,419-429
- EGRESS_THRESHOLD 20:          ryu/testing/experimental_development/TestCase_2/Controller2.py:79-80
- ESCALATE_PERSIST 4:           ryu/testing/experimental_development/TestCase_7/timeStamp2.py:353-359
- POLL_INTERVAL_S 2 (3 in TCs): ryu/src/deployed_controller/DIPA_Controller.py:308-320; TestCase_5/timeStamp.py:199-203
- LOADER_PORT 48101, TELNET 23/2323: DIPA_Controller.py:469,478; local_controller/demo4.py:360
- FLOW_IDLE/HARD timeouts 60/100 s: DIPA_Controller.py:222,225
- DETECT_PRIORITY 10 / BLOCK 100:   DIPA_Controller.py:459; TestCase_5/timeStamp.py:318
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DetectionConfig:
    pkt_rate_threshold: float = 25.0
    bias_threshold: float = 0.6
    compromise_pct: float = 50.0
    attack_threshold_kbps: float = 4000.0
    attacker_threshold_kbps: float = 1000.0
    peace_threshold_kbps: float = 10.0
    port_flood_pkts: int = 1000
    sustained_count: int = 5
    calm_count: int = 5
    egress_threshold: int = 20
    escalate_persist: int = 4
    poll_interval_s: float = 2.0
    test_poll_interval_s: float = 3.0
    loader_port: int = 48101
    telnet_ports: tuple[int, ...] = (23, 2323)
    flow_idle_timeout_s: int = 60
    flow_hard_timeout_s: int = 100
    detect_priority: int = 10
    block_priority: int = 100


DEFAULT = DetectionConfig()


@dataclass(frozen=True)
class ScaleConfig:
    """Scale dials for the training-data/similarity operators — the 100×
    story in one place. Functions take these as parameter DEFAULTS (call
    sites can still override per-corpus); changing a dial here retunes the
    whole engine consistently.

    - MinHash-LSH: recall at Jaccard t is 1-(1-t^rows)^bands — more bands
      = higher recall AND more candidate mass. bands×rows must not exceed
      minhash_num_perm.
    - Hyperplane LSH: candidates scale ~ (probes per query) × (bucket
      occupancy); probe_radius trades recall for candidate mass.
    - IVF: scanned fraction ≈ ivf_n_probe / ivf_n_list; training collect
      is bounded by ivf_sample_per_list × ivf_n_list rows REGARDLESS of
      corpus size.
    - Shard packing: shard_tokens is the training-shard size contract;
      pack_range_width only shapes parallelism (any value yields identical
      shards — certified by the oracle equality of the scalable twin).
    """

    minhash_num_perm: int = 16
    minhash_bands: int = 8
    minhash_rows_per_band: int = 2
    # n-gram near-dup production banding: recall at Jaccard t is
    # 1-(1-t^4)^8 — ≈0.985 at t=0.8 (the near-dup regime), while the
    # low-J collision tail that floods the r=1 exact-parity blocker is
    # suppressed by the 4-row AND within each band.
    ngram_num_perm: int = 32
    ngram_bands: int = 8
    ngram_rows_per_band: int = 4
    ngram_near_dup_threshold: float = 0.8
    ann_n_planes: int = 8
    ann_probe_radius: int = 2
    pair_lsh_n_planes: int = 8
    pair_lsh_probe_radius: int = 2
    ivf_n_list: int = 16
    ivf_n_probe: int = 4
    ivf_sample_per_list: int = 256
    pq_m: int = 8
    pq_ksub: int = 32
    pq_sample_cap: int = 4096
    # IVF-PQ (IVFADC, r11): residual encoding moved clustered recall@5
    # 0.60-floor → 0.74 at the flat-PQ geometry (m=8/ksub=32); the finer
    # split below carries it to 0.88 (measured, 20×10 seeded fixture) at
    # 16-byte codes — still 16–32× over float32/64 at d=64, and dsub=4 /
    # 6-bit codewords is inside the standard FAISS envelope. Flat PQ
    # (no coarse quantizer to residualize against) keeps pq_m/pq_ksub.
    ivfpq_m: int = 16
    ivfpq_ksub: int = 64
    shard_tokens: int = 4096
    pack_range_width: int = 512
    # Context-window chunking (RAG / pretraining prep): fixed token window
    # with overlap = chunk_tokens - chunk_stride. Production values are
    # e.g. 512/384; the dials here match the synthetic corpus' ~50-token
    # docs so the multi-chunk path is exercised at every test SF.
    chunk_tokens: int = 32
    chunk_stride: int = 24


SCALE = ScaleConfig()
