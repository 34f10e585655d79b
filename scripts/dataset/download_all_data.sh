#!/usr/bin/env bash
# Fetch the 11 Allen Institute label-free-prediction datasets (~100GB).
# Requires network access; run outside restricted environments.
set -e
mkdir -p data
for name in beta_actin myosin_iib membrane_caax_63x desmoplakin sec61_beta \
            st6gal1 fibrillarin lamin_b1 alpha_tubulin tom20 zo1; do
  wget -c "https://s3-us-west-2.amazonaws.com/downloads.allencell.org/publication-data/label-free-prediction/${name}.tar.gz"
  tar -C ./data -xvzf "./${name}.tar.gz"
done
