#!/usr/bin/env bash
# Convert a NetCDF-4/HDF5 container to NetCDF classic (CDF-1/2) so
# graft.sources.NetCdf can read it — the day-one path for CDS-downloaded
# ERA5, which commonly arrives as NetCDF-4.
#
# Usage: tools/convert_netcdf4.sh in.nc out.nc
#
# Tries, in order, whichever converter is installed:
#   1. nccopy -k classic   (netcdf-bin — the canonical converter)
#   2. ncks -3             (nco)
#   3. python netCDF4/xarray one-liner (scipy engine writes classic)
set -euo pipefail

if [ $# -ne 2 ]; then
  echo "usage: $0 <in.nc (NetCDF-4)> <out.nc (classic)>" >&2
  exit 2
fi
IN="$1"; OUT="$2"

if command -v nccopy >/dev/null 2>&1; then
  exec nccopy -k classic "$IN" "$OUT"
fi

if command -v ncks >/dev/null 2>&1; then
  exec ncks -3 "$IN" "$OUT"
fi

if command -v python3 >/dev/null 2>&1; then
  exec python3 - "$IN" "$OUT" <<'EOF'
import sys
try:
    import xarray as xr
    xr.open_dataset(sys.argv[1]).to_netcdf(sys.argv[2], format="NETCDF3_64BIT")
except ImportError:
    sys.exit("need nccopy (netcdf-bin), ncks (nco), or python3+xarray "
             "to convert NetCDF-4 to classic")
EOF
fi

echo "no converter found: install netcdf-bin (nccopy), nco (ncks), or python3+xarray" >&2
exit 3
