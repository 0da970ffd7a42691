// LAMMPS pair style driving a deployed SevenNet-TPU artifact through
// libsevenn_exec (runtime/sevenn_exec.cpp) -- the replacement for the
// reference's pair_e3gnn.cpp + patch_lammps.sh flow (there, a
// TorchScript model executes inside the pair style; here, the deployed
// StableHLO artifact executes through the in-process PJRT client).
//
// STATUS: reference scaffold. This container ships no LAMMPS source
// tree, so this file is not compiled here; the execution core it calls
// (libsevenn_exec) IS built and numerically verified in this repo
// (tests/test_pjrt_host.py::test_sevenn_exec_library). To integrate:
//
//   1. tools/build_sevenn_exec.sh lammps/lib/libsevenn_exec.so
//   2. copy this file + pair_sevennet_tpu.h into lammps/src/
//   3. add -lsevenn_exec to the LAMMPS link line and build
//   4. pair_style sevennet_tpu deployed_serial/
//      pair_coeff * * Hf O
//
// Conventions mirrored from the reference pair style
// (pair_e3gnn.cpp):
//   - full neighbor lists, newton off contributions handled by the
//     symmetric edge list (both (i,j) and (j,i) present)
//   - edge_vec = x[j] - x[i] (message destination i = edge_idx[0])
//   - per-step virial from the returned Voigt stress * volume
//
// The deployed capacities (signature.yaml n_node/n_edge) bound the
// local+ghost atom and edge counts; redeploy with larger
// --n-node/--n-edge for bigger subdomains.

#ifdef LAMMPS_VERSION_NUMBER  // only meaningful inside a LAMMPS tree

#include "pair_sevennet_tpu.h"

#include <cstring>
#include <vector>

#include "atom.h"
#include "comm.h"
#include "domain.h"
#include "error.h"
#include "force.h"
#include "memory.h"
#include "neigh_list.h"
#include "neigh_request.h"
#include "neighbor.h"

extern "C" {
int sevenn_exec_init(const char* artifact_dir);
int sevenn_exec_capacity(int* n_node, int* n_edge);
int sevenn_exec_run(const int* z, const int* edge_idx,
                    const float* edge_vec, const float* edge_mask,
                    const float* node_mask, float cell_volume,
                    float* energy, float* forces, float* stress);
int sevenn_exec_free();
}

using namespace LAMMPS_NS;

PairSevenNetTPU::PairSevenNetTPU(LAMMPS* lmp) : Pair(lmp) {
  single_enable = 0;
  restartinfo = 0;
  one_coeff = 1;
  manybody_flag = 1;
}

PairSevenNetTPU::~PairSevenNetTPU() { sevenn_exec_free(); }

void PairSevenNetTPU::settings(int narg, char** arg) {
  if (narg != 1) error->all(FLERR, "pair_style sevennet_tpu <artifact>");
  if (sevenn_exec_init(arg[0]) != 0)
    error->all(FLERR, "sevennet_tpu: artifact init failed");
  sevenn_exec_capacity(&cap_node_, &cap_edge_);
}

void PairSevenNetTPU::coeff(int narg, char** arg) {
  // pair_coeff * * <element for type 1> <element for type 2> ...
  // map LAMMPS types to atomic numbers via the artifact's
  // meta.yaml chemical_symbols_to_index (left to the integrator; the
  // scaffold takes Z directly from atom->type -> z_of_type_ set here)
  if (!allocated) allocate();
  for (int i = 3; i < narg; ++i)
    z_of_type_.push_back(symbol_to_z(arg[i]));
}

void PairSevenNetTPU::compute(int eflag, int vflag) {
  ev_init(eflag, vflag);
  const int nlocal = atom->nlocal;
  const int nall = nlocal + atom->nghost;
  if (nall > cap_node_)
    error->one(FLERR, "sevennet_tpu: n_node capacity exceeded; "
                      "redeploy with a larger --n-node");

  std::vector<int> z(cap_node_, 0);
  std::vector<float> node_mask(cap_node_, 0.f);
  for (int i = 0; i < nall; ++i) {
    z[i] = z_of_type_[atom->type[i] - 1];
    node_mask[i] = (i < nlocal) ? 1.f : 0.f;  // ghosts carry no energy
  }

  // symmetric edge list from the full neighbor list
  std::vector<int> eidx(2 * cap_edge_, cap_node_ - 1);
  std::vector<float> evec(3 * cap_edge_, 0.f);
  std::vector<float> emask(cap_edge_, 0.f);
  int ne = 0;
  NeighList* l = list;
  for (int ii = 0; ii < l->inum; ++ii) {
    const int i = l->ilist[ii];
    for (int jj = 0; jj < l->numneigh[i]; ++jj) {
      int j = l->firstneigh[i][jj] & NEIGHMASK;
      if (ne >= cap_edge_)
        error->one(FLERR, "sevennet_tpu: n_edge capacity exceeded");
      eidx[ne] = i;                 // row 0: destination
      eidx[cap_edge_ + ne] = j;     // row 1: source
      for (int d = 0; d < 3; ++d)
        evec[3 * ne + d] =
            static_cast<float>(atom->x[j][d] - atom->x[i][d]);
      emask[ne] = 1.f;
      ++ne;
    }
  }

  float e = 0.f, stress[6];
  std::vector<float> f(3 * cap_node_, 0.f);
  const float vol = static_cast<float>(domain->xprd * domain->yprd *
                                       domain->zprd);
  if (sevenn_exec_run(z.data(), eidx.data(), evec.data(), emask.data(),
                      node_mask.data(), vol, &e, f.data(), stress) != 0)
    error->one(FLERR, "sevennet_tpu: execute failed");

  for (int i = 0; i < nall; ++i)
    for (int d = 0; d < 3; ++d) atom->f[i][d] += f[3 * i + d];
  if (eflag_global) eng_vdwl += e;
  if (vflag_global) {
    // model stress is -virial/V in Voigt (xx yy zz xy yz zx)
    virial[0] -= stress[0] * vol;
    virial[1] -= stress[1] * vol;
    virial[2] -= stress[2] * vol;
    virial[3] -= stress[3] * vol;  // xy
    virial[4] -= stress[5] * vol;  // xz (model zx)
    virial[5] -= stress[4] * vol;  // yz
  }
}

void PairSevenNetTPU::init_style() {
  neighbor->add_request(this, NeighConst::REQ_FULL);
}

#endif  // LAMMPS_VERSION_NUMBER
