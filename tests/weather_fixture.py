"""Deterministic weather-domain fixture per FIXTURES.md: 27 districts,
3 full years of daily rows, M/D/YYYY non-padded string dates, value
distributions that straddle every query threshold, plus dirty rows
(malformed dates, nulls, repeated header) that ingest must drop."""

from __future__ import annotations

import csv
from datetime import date, timedelta
from pathlib import Path

import numpy as np

CITIES = [
    "Colombo", "Gampaha", "Kalutara", "Kandy", "Matale", "Nuwara Eliya",
    "Galle", "Matara", "Hambantota", "Jaffna", "Kilinochchi", "Mannar",
    "Vavuniya", "Mullaitivu", "Batticaloa", "Ampara", "Trincomalee",
    "Kurunegala", "Puttalam", "Anuradhapura", "Polonnaruwa", "Badulla",
    "Moneragala", "Ratnapura", "Kegalle", "Matugama", "Chilaw",
]

N_DIRTY = 5


def generate(out_dir: str, years: tuple[int, int] = (2012, 2014), seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    loc_rows = []
    for i, city in enumerate(CITIES, start=1):
        loc_rows.append(
            [
                i,
                round(float(rng.uniform(5.9, 9.8)), 4),
                round(float(rng.uniform(79.7, 81.9)), 4),
                int(rng.integers(0, 1900)),
                19800,
                "Asia/Colombo",
                "+0530",
                city,
            ]
        )
    with open(out / "location.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            "location_id latitude longitude elevation utc_offset_seconds "
            "timezone timezone_abbreviation city_name".split()
        )
        w.writerows(loc_rows)

    d0, d1 = date(years[0], 1, 1), date(years[1], 12, 31)
    days = [(d0 + timedelta(days=k)) for k in range((d1 - d0).days + 1)]
    header = (
        "location_id,date,weather_code,temperature_2m_max,temperature_2m_min,"
        "temperature_2m_mean,apparent_temperature_max,apparent_temperature_min,"
        "apparent_temperature_mean,daylight_duration,sunshine_duration,"
        "precipitation_sum,rain_sum,precipitation_hours,wind_speed_10m_max,"
        "wind_gusts_10m_max,wind_direction_10m_dominant,shortwave_radiation_sum,"
        "et0_fao_evapotranspiration,sunrise,sunset"
    )
    n_clean = 0
    with open(out / "weather.csv", "w", newline="") as f:
        f.write(header + "\n")
        w = csv.writer(f)
        for i, city in enumerate(CITIES, start=1):
            base_t = float(rng.uniform(18, 32))  # city-level mean straddling 22 and 30
            for d in days:
                tmax = base_t + float(rng.normal(4, 2))
                tmin = base_t - float(rng.normal(4, 2))
                tmean = (tmax + tmin) / 2 + float(rng.normal(0, 0.5))
                sunshine = float(rng.uniform(0, 43200))
                precip = max(0.0, float(rng.gamma(0.6, 9)))  # long tail past 50
                wind = float(rng.uniform(5, 35))
                gusts = wind + float(rng.uniform(5, 80))
                et0 = max(
                    0.3,
                    2.5 + 0.00006 * sunshine + 0.04 * wind - 0.03 * precip
                    + float(rng.normal(0, 0.4)),
                )
                w.writerow(
                    [
                        i,
                        f"{d.month}/{d.day}/{d.year}",  # M/D/YYYY, no padding
                        int(rng.integers(0, 99)),
                        round(tmax, 2),
                        round(tmin, 2),
                        round(tmean, 2),
                        round(tmax + 1.1, 2),
                        round(tmin - 1.1, 2),
                        round(tmean + 0.3, 2),
                        round(float(rng.uniform(42000, 46000)), 1),
                        round(sunshine, 1),
                        round(precip, 2),
                        round(precip * 0.9, 2),
                        round(min(24.0, precip / 2), 2),
                        round(wind, 2),
                        round(gusts, 2),
                        round(float(rng.uniform(0, 360)), 1),
                        round(float(rng.uniform(5, 25)), 2),
                        round(et0, 3),
                        "6:12 AM",
                        "6:24 PM",
                    ]
                )
                n_clean += 1
        # dirty slice (FIXTURES §3): bad dates, nulls, a repeated header
        w.writerow([1, "not-a-date", 0] + [1.0] * 16 + ["6:00 AM", "6:00 PM"])
        w.writerow([1, "2013-05-01", 0] + [1.0] * 16 + ["6:00 AM", "6:00 PM"])
        w.writerow(["", "1/5/2013", 0] + [1.0] * 16 + ["6:00 AM", "6:00 PM"])
        f.write(header + "\n")  # repeated header mid-file
        w.writerow([2, "13/45/2013", 0] + [1.0] * 16 + ["6:00 AM", "6:00 PM"])

    return {
        "location_csv": str(out / "location.csv"),
        "weather_csv": str(out / "weather.csv"),
        "n_locations": len(CITIES),
        "n_clean_weather": n_clean,
        "years": years,
    }
