"""Google Sheets source — the reference's live bronze entry point.

Counterpart of reference ``bronze/data_loader.py:39-84`` + the
``SHEET_RANGES`` table map (reference config.py:20-27): fetch a sheet
range via the public Sheets v4 REST endpoint, turn the values grid
into a padded all-string DataFrame (headers from row 0, short rows
padded with '' — data_loader.py:74-77), and land it through the same
bronze writer the CSV path uses.

Design notes vs the reference:

- The reference builds an authorized ``googleapiclient`` service from
  a service-account file. Those SDKs are optional here; the fetch
  layer speaks the v4 REST protocol directly over stdlib urllib
  (``GET {base}/v4/spreadsheets/{id}/values/{range}?key=...``), which
  covers API-key / public-sheet access, and accepts an injectable
  ``opener`` + ``base_url`` so (a) a service-account bearer token from
  any auth stack can be layered on without importing Google SDKs, and
  (b) the whole fetch->parse->land path is testable against a
  localhost HTTP server — the sandbox has no external network, so the
  protocol path is pinned by a local test rather than left as an
  untested stub.
- Values arrive as strings (the API's default ValueRenderOption
  mirrors what the reference got from values.get); typing happens in
  silver, exactly like the CSV path — bronze is raw by contract.

At 100 TB this source is an edge feed (reference sheets are ~50K
rows); the DataFrame is created driver-side from one HTTP response,
then written as parquet — the same bounded-ingest shape as the
reference's pandas load.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

#: reference config.py:20-27 — table -> A1 range
SHEET_RANGES = {
    "suppliers": "Suppliers!A:D",
    "products": "Products!A:G",
    "warehouses": "Warehouses!A:E",
    "inventory": "Inventory!A:E",
    "retail_stores": "RetailStores!A:F",
    "supply_orders": "SupplyOrders!A:L",
}

DEFAULT_BASE_URL = "https://sheets.googleapis.com"

Opener = Callable[[str], bytes]


class SheetsFetchError(RuntimeError):
    """One range's fetch or parse failed: an HTTP error that survived
    the retry budget (e.g. 403 permission-denied, 429 after retries)
    or a body that is not a JSON object. ``ingest_sheets`` catches this
    per range — the reference's per-table try/except degrade
    (data_loader.py:83-85) — so one broken range never aborts the
    whole ingest."""


#: HTTP statuses worth retrying: rate-limit + transient server errors.
#: 403 (permission / API-key scope) is NOT here — retrying an auth
#: failure only burns quota.
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


def _default_opener(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        return resp.read()


def fetch_sheet_values(spreadsheet_id: str, range_name: str,
                       api_key: str | None = None,
                       base_url: str = DEFAULT_BASE_URL,
                       opener: Opener = _default_opener,
                       max_retries: int = 2,
                       backoff_s: float = 0.5) -> list[list[str]]:
    """GET the raw ``values`` grid for one range (Sheets v4
    ``spreadsheets.values.get``; reference data_loader.py:58-64).
    Returns [] for an empty range, like the reference's
    ``result.get('values', [])``.

    Failure semantics (the reference swallows every exception into an
    empty DataFrame, silently conflating "empty range" with "broken
    fetch" — here the two are distinct):

    - HTTP 429/5xx: retried up to ``max_retries`` times with
      exponential backoff (``backoff_s * 2**attempt``) — the standard
      Sheets-API rate-limit discipline;
    - HTTP 403 (or any other status, or retries exhausted): raises
      :class:`SheetsFetchError` immediately — auth failures are not
      retryable;
    - non-JSON / non-object body: raises :class:`SheetsFetchError`;
    - a well-formed response with no ``values`` key: [] (empty range,
      NOT an error).
    """
    import time

    quoted = urllib.parse.quote(range_name, safe="!:")
    url = f"{base_url}/v4/spreadsheets/{urllib.parse.quote(spreadsheet_id)}/values/{quoted}"
    if api_key:
        url += "?" + urllib.parse.urlencode({"key": api_key})
    for attempt in range(max_retries + 1):
        try:
            body = opener(url)
            break
        except urllib.error.HTTPError as e:
            if e.code in RETRYABLE_STATUSES and attempt < max_retries:
                time.sleep(backoff_s * (2 ** attempt))
                continue
            raise SheetsFetchError(
                f"{range_name}: HTTP {e.code} after {attempt + 1} attempt(s)"
            ) from e
        except OSError as e:  # connection refused / DNS / timeout
            if attempt < max_retries:
                time.sleep(backoff_s * (2 ** attempt))
                continue
            raise SheetsFetchError(f"{range_name}: {e}") from e
    try:
        payload = json.loads(body.decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as e:
        raise SheetsFetchError(f"{range_name}: malformed JSON body") from e
    if not isinstance(payload, dict):
        raise SheetsFetchError(f"{range_name}: non-object JSON body")
    return payload.get("values", [])


def values_to_rows(values: list[list[str]]) -> tuple[list[str], list[list[str]]]:
    """Header row + data rows padded to header width with '' (short
    rows: reference data_loader.py:70-77 verbatim semantics). LONG
    rows are TRUNCATED to header width — a deliberate leniency over
    the reference, whose ``pd.DataFrame(data, columns=headers)`` raises
    on rows wider than the header; that error is swallowed by the
    surrounding try/except (data_loader.py:83-85), so the reference
    silently degrades the WHOLE range to an empty DataFrame. Here a
    ragged export keeps every row (minus the overflow cells) instead
    of losing the range."""
    if not values:
        return [], []
    headers = [str(h) for h in values[0]]
    width = len(headers)
    rows = []
    for row in values[1:]:
        cells = [str(c) for c in row[:width]]
        if len(cells) < width:
            cells = cells + [""] * (width - len(cells))
        rows.append(cells)
    return headers, rows


def read_sheet(spark: SparkSession, spreadsheet_id: str, range_name: str,
               api_key: str | None = None,
               base_url: str = DEFAULT_BASE_URL,
               opener: Opener = _default_opener) -> DataFrame:
    """One sheet range as an all-string DataFrame (raw bronze shape —
    same contract as the PERMISSIVE CSV read)."""
    headers, rows = values_to_rows(
        fetch_sheet_values(spreadsheet_id, range_name, api_key, base_url, opener))
    if not headers:
        return spark.createDataFrame([], "placeholder string").limit(0).drop("placeholder")
    schema = ", ".join(f"`{h}` string" for h in headers)
    return spark.createDataFrame(rows, schema)


def ingest_sheets(spark: SparkSession, spreadsheet_id: str, warehouse: str,
                  ranges: dict[str, str] | None = None,
                  api_key: str | None = None,
                  base_url: str = DEFAULT_BASE_URL,
                  opener: Opener = _default_opener) -> dict[str, int]:
    """Fetch every configured range and land it as bronze parquet —
    the live dual of ``plans.bronze.ingest_csv_dir`` (reference
    data_loader.py's per-table load loop). Tables whose fetch returns
    no rows are skipped, matching the reference's empty-DataFrame
    early-out.

    A range whose fetch FAILS (:class:`SheetsFetchError`: 403, 429
    past the retry budget, malformed body) is likewise skipped — the
    reference's per-table try/except degrade (data_loader.py:83-85) —
    but loudly: a warning is emitted per failed range, and the failure
    is visible in the return value as an absent key, so a caller that
    requires all tables can assert ``set(counts) == set(ranges)``."""
    import warnings

    from ..plans.bronze import write_bronze

    dfs = {}
    for name, rng in (ranges or SHEET_RANGES).items():
        try:
            df = read_sheet(spark, spreadsheet_id, rng, api_key, base_url,
                            opener)
        except SheetsFetchError as e:
            warnings.warn(f"sheets ingest: skipping range {name!r}: {e}",
                          stacklevel=2)
            continue
        if df.columns:
            dfs[name] = df
    return write_bronze(dfs, warehouse)
