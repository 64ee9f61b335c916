"""Deterministic docsis fixture generator (FIXTURES.md §2).

Synthesizes the nested time-series table the reference exporter produces
(reference ``tables.sql:5-30``, ``mb8600.py:366-438``), including the raw
packed wire-format strings so the parse path is testable end-to-end:

- ``downstream_raw``: records joined by ``|+|``; 10 ``^``-separated fields
  per record, positions per ``mb8600.py:371``
  (``_^_^modulation^channel_id^frequency_MHz^power^snr^correcteds^uncorrecteds^_``),
  frequency in MHz (pre *1e6), SNR pre-correction so the OFDM-PLC CASE
  branch (``mb8600.py:372-376``) is exercised.
- ``upstream_raw``: 8 fields per record, positions per ``mb8600.py:391``
  (``_^_^modulation^channel_id^width^frequency_MHz^power^_``).
- ``uptime_raw``: formats matched by the reference regex ``mb8600.py:21``
  including missing-group variants (the reference crashes on those,
  ``mb8600.py:404-410``; this engine coalesces to 0).

The *stored* nested arrays are derived by parsing the raw strings with the
reference's exact semantics, so raw -> parsed round-trip tests (SURVEY.md
Q31) compare exactly. Seed fixed at 42; rerunning produces byte-identical
tables.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

MODEMS = ["MB8600", "MB8600-attic", "MB8600-lab"]
VERSIONS = ["8600-19.2.18", "8600-19.2.20", "8600-22.3.5"]
CONFIGS = ["bc1000.cm", "bc2500.cm", "gold.cm"]
DS_MODULATIONS = ["QAM256", "QAM256", "QAM256", "OFDM PLC"]
US_MODULATIONS = ["SC-QAM", "OFDMA"]

ROWS_PER_MODEM = {"sf0.001": 120, "sf0.01": 1200, "sf0.1": 12000}
START = dt.datetime(2025, 6, 1, 0, 0, 0)
SPAN_SECONDS = 8 * 86400  # >= 7 distinct dates for partition-pruning tests

ARROW_DS_CHANNEL = pa.struct(
    [
        ("channel_id", pa.int32()),
        ("frequency", pa.float32()),
        ("modulation", pa.string()),
        ("power", pa.float32()),
        ("snr", pa.float32()),
        ("corrected_errors", pa.int64()),
        ("uncorrected_errors", pa.int64()),
    ]
)
ARROW_US_CHANNEL = pa.struct(
    [
        ("channel_id", pa.int32()),
        ("frequency", pa.float32()),
        ("modulation", pa.string()),
        ("power", pa.float32()),
        ("width", pa.float32()),
    ]
)
ARROW_SCHEMA = pa.schema(
    [
        ("modem_name", pa.string()),
        ("modem_config_filename", pa.string()),
        ("modem_uptime", pa.int64()),
        ("modem_version", pa.string()),
        ("modem_model", pa.string()),
        ("downstream_channels", pa.list_(ARROW_DS_CHANNEL)),
        ("upstream_channels", pa.list_(ARROW_US_CHANNEL)),
        ("scrape_latency", pa.float32()),
        ("timestamp", pa.timestamp("us")),
        ("downstream_raw", pa.string()),
        ("upstream_raw", pa.string()),
        ("uptime_raw", pa.string()),
    ]
)


def _parse_downstream(raw: str) -> list[dict]:
    """Reference parse semantics, mb8600.py:370-386 (incl. OFDM SNR fix)."""
    out = []
    for channel in raw.split("|+|"):
        _, _, modulation, channel_id, frequency, power, snr, cor, uncor, _ = channel.split("^")
        snr = float(snr)
        if modulation == "OFDM PLC" and snr < 20.0:
            snr *= 2.5
        out.append(
            {
                "channel_id": int(channel_id),
                "frequency": float(frequency) * 1_000_000,
                "modulation": modulation,
                "power": float(power),
                "snr": snr,
                "corrected_errors": int(cor),
                "uncorrected_errors": int(uncor),
            }
        )
    return out


def _parse_upstream(raw: str) -> list[dict]:
    """Reference parse semantics, mb8600.py:389-398."""
    out = []
    for channel in raw.split("|+|"):
        _, _, modulation, channel_id, width, frequency, power, _ = channel.split("^")
        out.append(
            {
                "channel_id": int(channel_id),
                "frequency": float(frequency) * 1_000_000,
                "modulation": modulation,
                "power": float(power),
                "width": float(width) * 1000,
            }
        )
    return out


def _uptime_raw(rng: random.Random, variant: int) -> tuple[str, int]:
    """Uptime string in one of the regex-matched shapes (mb8600.py:21) + its
    coalesce-0 parse (days absent on variant>=1 etc. — the reference's
    int(None) crash cases, mb8600.py:404-410)."""
    days, hours, minutes, seconds = (
        rng.randint(0, 45),
        rng.randint(0, 23),
        rng.randint(0, 59),
        rng.randint(0, 59),
    )
    if variant == 0:
        return f"{days}days {hours:02d}h:{minutes:02d}m:{seconds:02d}s", days * 86400 + hours * 3600 + minutes * 60 + seconds
    if variant == 1:
        return f"{hours:02d}h:{minutes:02d}m:{seconds:02d}s", hours * 3600 + minutes * 60 + seconds
    if variant == 2:
        return f"{minutes:02d}m:{seconds:02d}s", minutes * 60 + seconds
    return f"{seconds:02d}s", seconds


def generate_docsis(sf: str, out_dir: str) -> str:
    rng = random.Random(f"docsis-42-{sf}")
    n_rows = ROWS_PER_MODEM[sf]
    step = SPAN_SECONDS // n_rows if n_rows <= SPAN_SECONDS else 1

    rows = {name: [] for name in ARROW_SCHEMA.names}
    for m_idx, modem in enumerate(MODEMS):
        n_ds = rng.randint(24, 33)
        n_us = rng.randint(4, 8)
        # per-channel monotone counters with occasional resets / overflow
        cor = [rng.randint(0, 5000) for _ in range(n_ds)]
        uncor = [rng.randint(0, 500) for _ in range(n_ds)]
        ds_freq = [400.0 + 6.0 * c for c in range(n_ds)]
        us_freq = [16.4 + 6.4 * c for c in range(n_us)]
        ds_mod = [
            "OFDM PLC" if c >= n_ds - 2 else DS_MODULATIONS[rng.randrange(3)]
            for c in range(n_ds)
        ]
        us_mod = [US_MODULATIONS[c % 2] for c in range(n_us)]

        for i in range(n_rows):
            ts = START + dt.timedelta(seconds=(i * step) + m_idx)
            ds_recs = []
            for c in range(n_ds):
                cor[c] += rng.randint(0, 40)
                uncor[c] += rng.randint(0, 8)
                if rng.random() < 0.004:  # counter reset (modem reboot)
                    cor[c], uncor[c] = rng.randint(0, 10), 0
                if rng.random() < 0.002:  # firmware overflow bug -> negative
                    uncor[c] = -rng.randint(1, 2**31)
                snr_raw = (
                    round(rng.uniform(12.0, 19.9), 1)
                    if ds_mod[c] == "OFDM PLC" and rng.random() < 0.6
                    else round(rng.uniform(30.0, 45.0), 1)
                )
                power = round(rng.uniform(-8.0, 8.0), 1)
                ds_recs.append(
                    f"1^Locked^{ds_mod[c]}^{c + 1}^{ds_freq[c]:.1f}^{power:.1f}"
                    f"^{snr_raw:.1f}^{cor[c]}^{uncor[c]}^ "
                )
            us_recs = []
            for c in range(n_us):
                power = round(rng.uniform(38.0, 51.0), 1)
                width = rng.choice([1600.0, 3200.0, 6400.0])
                us_recs.append(
                    f"1^Locked^{us_mod[c]}^{c + 1}^{width:.1f}^{us_freq[c]:.1f}^{power:.1f}^ "
                )
            downstream_raw = "|+|".join(ds_recs)
            upstream_raw = "|+|".join(us_recs)
            uptime_raw, uptime = _uptime_raw(rng, rng.randrange(4) if i % 7 == 0 else 0)

            rows["modem_name"].append(modem)
            rows["modem_config_filename"].append(
                None if rng.random() < 0.05 else CONFIGS[m_idx]
            )
            rows["modem_uptime"].append(uptime)
            rows["modem_version"].append(VERSIONS[(m_idx + (i > n_rows // 2)) % 3])
            rows["modem_model"].append("MB8600")
            rows["downstream_channels"].append(_parse_downstream(downstream_raw))
            rows["upstream_channels"].append(_parse_upstream(upstream_raw))
            rows["scrape_latency"].append(round(rng.uniform(0.05, 3.0), 3))
            rows["timestamp"].append(ts)
            rows["downstream_raw"].append(downstream_raw)
            rows["upstream_raw"].append(upstream_raw)
            rows["uptime_raw"].append(uptime_raw)

    table = pa.Table.from_pydict(rows, schema=ARROW_SCHEMA)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "docsis.parquet")
    pq.write_table(table, path, row_group_size=4096)
    return path


def docsis_path_for(sf_dir: str) -> str:
    """Map a driver testdata dir (/root/testdata/sf0.01) to the repo-local
    docsis fixture for the same scale factor, generating it if missing."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo_root, "data", sf, "docsis.parquet")
    if not os.path.exists(path):
        generate_docsis(sf, os.path.dirname(path))
    return path


if __name__ == "__main__":
    for sf in ROWS_PER_MODEM:
        p = generate_docsis(sf, f"/root/repo/data/{sf}")
        print("wrote", p)
