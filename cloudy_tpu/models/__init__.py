"""Model drivers: 0-D box, 1-D rainshaft column, adiabatic parcel."""
