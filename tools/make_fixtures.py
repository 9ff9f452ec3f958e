#!/usr/bin/env python3
"""Deterministic flight-domain CSV fixtures (FIXTURES.md §A).

Regenerates src/test/resources/*.csv byte-identically. Values are
hand-designed to exercise every cleaning edge (T-2 title-case, T-3
stopover decision table, T-4 coercion+rounding, T-5 validity filter,
T-7 timestamp parse, T-8 dim builds) while keeping the columns used by
oracle queries representation-safe across Spark and DuckDB:
seasonality values are trim/title-invariant, numerics avoid exact
half-way rounding boundaries, timestamps are ISO `yyyy-MM-dd HH:mm:ss`.
"""
import os

HEADER = ("Airline,Source,Source Name,Destination,Destination Name,"
          "Departure Date & Time,Arrival Date & Time,Duration (hrs),Stopovers,"
          "Aircraft Type,Class,Booking Source,Base Fare (BDT),"
          "Tax & Surcharge (BDT),Total Fare (BDT),Seasonality,"
          "Days Before Departure")

AIRLINES = [" biman Bangladesh ", "US-bangla", "novoair", "Air astra  ",
            "biman bangladesh", "NOVOAIR", "us-BANGLA", "air astra"]
AIRPORTS = [("DAC", "hazrat shahjalal intl"), ("CGP", "shah amanat intl"),
            ("ZYL", "osmani intl"), ("CXB", "cox's bazar"),
            ("SPD", "saidpur"), ("JSR", "jashore")]
STOPS = ["Direct", "Non-stop", "direct", "1 Stop", "2 stops", "3 STOPS",
         "many stops", "transit", "non-stop  "]
CLASSES = ["economy", "Business", " first "]
AIRCRAFT = ["boeing 737", "ATR 72", "dash 8-Q400"]
BOOKING = ["online", "Agent", "MOBILE app"]
SEASONS = ["Winter", "Peak", "Normal", "Eid", "Monsoon"]
DATES = ["2024-01-05", "2024-01-06", "2024-01-07", "2024-02-14",
         "2024-03-01", "2024-03-31", "2024-04-13", "2024-05-18",
         "2024-06-29", "2024-07-01"]


def rows_valid(n, start=0):
    out = []
    for i in range(start, start + n):
        al = AIRLINES[i % len(AIRLINES)]
        src = AIRPORTS[i % len(AIRPORTS)]
        dst = AIRPORTS[(i + 2) % len(AIRPORTS)]
        date = DATES[i % len(DATES)]
        dep = f"{date} {8 + (i % 12):02d}:30:00"
        arr = f"{date} {10 + (i % 12):02d}:15:00"
        dur = ["1.5", "2.25", "0.756", "1.1", "3.0"][i % 5]
        stop = STOPS[i % len(STOPS)]
        base = f"{3200 + 17 * i}.{(11 + i) % 100:02d}"
        tax = f"{420 + 3 * i}.{(7 + 2 * i) % 100:02d}"
        tot = f"{3650 + 20 * i}.{(23 + 3 * i) % 100:02d}"
        season = SEASONS[i % len(SEASONS)]
        out.append(",".join([
            al, src[0], src[1], dst[0], dst[1], dep, arr, dur, stop,
            AIRCRAFT[i % 3], CLASSES[i % 3], BOOKING[i % 3],
            base, tax, tot, season, str(5 + i % 40)]))
    return out


def rows_messy():
    # Each exercises a specific edge; comments give the operator.
    return [
        # T-7 garbage timestamp -> NULL departure_dt -> dropped from fact (T-12)
        "novoair,DAC,hazrat shahjalal intl,CGP,shah amanat intl,N/A,n/a,2.0,Direct,ATR 72,economy,online,3000.00,400.00,3400.00,Winter,10",
        # T-4 non-numeric fare -> 0 -> T-5 drop (total_fare)
        "US-bangla,CGP,shah amanat intl,DAC,hazrat shahjalal intl,2024-01-05 09:30:00,2024-01-05 11:00:00,1.5,Direct,ATR 72,economy,online,--,400.00,--,Winter,10",
        # T-5 negative fare drop
        "novoair,DAC,hazrat shahjalal intl,ZYL,osmani intl,2024-01-06 07:00:00,2024-01-06 08:00:00,1.0,Direct,ATR 72,Business,Agent,-100.00,0.00,-100.00,Peak,3",
        # T-5 zero/rounds-to-zero duration drop
        "Air astra  ,ZYL,osmani intl,DAC,hazrat shahjalal intl,2024-01-07 18:00:00,2024-01-07 19:00:00,0.004,1 Stop,dash 8-Q400, first ,MOBILE app,2500.00,300.00,2800.00,Normal,21",
        # empty numerics + empty seasonality (kept only if total>0: dropped)
        "biman bangladesh,CXB,cox's bazar,DAC,hazrat shahjalal intl,2024-02-14 12:00:00,2024-02-14 13:30:00,,2 stops,boeing 737,economy,online,,,,Eid,7",
        # valid row with empty seasonality -> dim_date seasonality NULL->Normal
        "NOVOAIR,SPD,saidpur,CGP,shah amanat intl,2024-08-09 06:45:00,2024-08-09 08:00:00,1.25,non-stop  ,ATR 72,Business,Agent,4100.00,500.00,4600.00,,14",
        # conflicting seasonality for 2024-01-05 (max-wins pins 'Winter')
        "us-BANGLA,JSR,jashore,DAC,hazrat shahjalal intl,2024-01-05 20:00:00,2024-01-05 21:10:00,1.2,direct,boeing 737,economy,MOBILE app,3300.00,410.00,3710.00,Eid,2",
        # garbage days_before_departure (int cast -> NULL in fact)
        "novoair,DAC,hazrat shahjalal intl,CXB,cox's bazar,2024-03-01 10:00:00,2024-03-01 11:10:00,1.15,Direct,ATR 72,economy,online,3500.00,450.00,3950.00,Normal,soon",
        # airport code duplicated with different spelling (dedup-by-code)
        "Air astra  ,DAC,HAZRAT SHAHJALAL international,SPD,saidpur,2024-05-18 15:30:00,2024-05-18 16:45:00,1.25,Non-stop,dash 8-Q400,Business,Agent,2950.00,380.00,3330.00,Peak,30",
    ]


def write(path, lines):
    with open(path, "w") as f:
        f.write(HEADER + "\n")
        f.write("\n".join(lines) + "\n")
    print(f"{path}: {len(lines)} data rows")


def main():
    res = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")
    os.makedirs(res, exist_ok=True)
    small = rows_valid(40) + rows_messy()
    write(os.path.join(res, "flights_small.csv"), small)
    # growth: same file + 15 new rows + 3 exact duplicates of earlier rows
    appended = small + rows_valid(15, start=100) + small[3:6]
    write(os.path.join(res, "flights_append.csv"), appended)
    # all-valid file for end-to-end pipeline + validation gate
    write(os.path.join(res, "flights_clean.csv"), rows_valid(50))
    # shrink-reset fixture (fewer lines than small)
    write(os.path.join(res, "flights_shrunk.csv"), rows_valid(10))


if __name__ == "__main__":
    main()
