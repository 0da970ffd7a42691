// libsevenn_exec: C API around the in-process PJRT execution of a
// deployed artifact (the embeddable sibling of pjrt_cpu_host.cpp).
//
// External MD hosts (the LAMMPS pair style scaffold in
// runtime/lammps/, or any C/C++/Fortran code) link this library and
// drive E/F/S steps with flat buffers -- the role libtorch plays for
// the reference's pair_e3gnn.cpp. Build:
//
//   tools/build_sevenn_exec.sh     (links the TF wheel's
//                                   libtensorflow_cc; see
//                                   runtime/README.md for the flag
//                                   requirements -- -DNDEBUG matters)
//
// API (all functions return 0 on success):
//   sevenn_exec_init(artifact_dir)       compile model_const.stablehlo
//   sevenn_exec_capacity(&n_node, &n_edge)
//   sevenn_exec_run(z, edge_idx, edge_vec, edge_mask, node_mask,
//                   cell_volume, energy_out, forces_out, stress_out)
//   sevenn_exec_free()
//
// Input contract = signature.yaml (scripts/deploy.py): arrays padded
// to the deployed capacities; edge_idx int32 (2, n_edge) with [0] the
// message destination; edge_vec f32 (n_edge, 3) = pos[src] - pos[dst]
// minimum-image displacements; masks 1.0 for real entries. Padding
// edge_vec rows MUST be nonzero (use (1,0,0)): r=0 NaNs the radial
// basis and NaN survives the mask multiply.

#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <string_view>
#include <vector>

#include "absl/status/status.h"
#include "xla/hlo/builder/xla_computation.h"
#include "xla/pjrt/pjrt_client.h"
#include "xla/pjrt/plugin/xla_cpu/cpu_client_options.h"
#include "xla/pjrt/plugin/xla_cpu/xla_cpu_pjrt_client.h"

namespace xla {
absl::Status ParseMlirModuleStringAndConvertToXlaComputation(
    std::string_view mlir_module_str, XlaComputation& xla_computation,
    bool use_tuple_args, bool return_tuple);
}  // namespace xla

namespace {

struct State {
  std::unique_ptr<xla::PjRtClient> client;
  std::unique_ptr<xla::PjRtLoadedExecutable> executable;
  xla::PjRtMemorySpace* mem = nullptr;
  int n_node = 0;
  int n_edge = 0;
};

State* g_state = nullptr;

std::string ReadFile(const std::string& path, bool* ok) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    *ok = false;
    return {};
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  *ok = true;
  return ss.str();
}

int ParseCapacity(const std::string& yaml, const char* key) {
  // minimal flat-yaml lookup: "<key>: <int>"
  auto pos = yaml.find(std::string(key) + ":");
  if (pos == std::string::npos) return -1;
  return std::atoi(yaml.c_str() + pos + std::strlen(key) + 1);
}

}  // namespace

extern "C" {

int sevenn_exec_init(const char* artifact_dir) {
  if (g_state) return 1;
  auto st = std::make_unique<State>();
  const std::string dir(artifact_dir);
  bool ok = false;
  const std::string mlir_text = ReadFile(dir + "/model_const.stablehlo",
                                         &ok);
  if (!ok) return 2;
  const std::string sig = ReadFile(dir + "/signature.yaml", &ok);
  if (!ok) return 2;
  st->n_node = ParseCapacity(sig, "n_node");
  st->n_edge = ParseCapacity(sig, "n_edge");
  if (st->n_node <= 0 || st->n_edge <= 0) return 3;

  xla::XlaComputation computation;
  if (!xla::ParseMlirModuleStringAndConvertToXlaComputation(
           mlir_text, computation, false, false)
           .ok()) {
    return 4;
  }
  auto client_or = xla::GetXlaPjrtCpuClient(xla::CpuClientOptions{});
  if (!client_or.ok()) return 5;
  st->client = std::move(*client_or);
  auto exec_or =
      st->client->CompileAndLoad(computation, xla::CompileOptions{});
  if (!exec_or.ok()) return 6;
  st->executable = std::move(*exec_or);
  auto mem_or =
      st->client->addressable_devices()[0]->default_memory_space();
  if (!mem_or.ok()) return 7;
  st->mem = *mem_or;
  g_state = st.release();
  return 0;
}

int sevenn_exec_capacity(int* n_node, int* n_edge) {
  if (!g_state) return 1;
  *n_node = g_state->n_node;
  *n_edge = g_state->n_edge;
  return 0;
}

int sevenn_exec_run(const int32_t* atomic_numbers,  // (n_node)
                    const int32_t* edge_idx,        // (2, n_edge)
                    const float* edge_vec,          // (n_edge, 3)
                    const float* edge_mask,         // (n_edge)
                    const float* node_mask,         // (n_node)
                    float cell_volume,
                    float* energy_out,              // (1)
                    float* forces_out,              // (n_node, 3)
                    float* stress_out) {            // (6)
  if (!g_state) return 1;
  State& st = *g_state;
  const int64_t nn = st.n_node, ne = st.n_edge;
  // flat inputs in sorted-key order (signature.yaml / deploy.py):
  // atomic_numbers, batch, cell_volume, edge_index, edge_mask,
  // edge_vec, node_mask, num_atoms
  std::vector<int32_t> batch(nn, 0);
  const float vol[1] = {cell_volume};
  const int32_t natoms[1] = {static_cast<int32_t>(nn)};

  struct In {
    const void* data;
    xla::PrimitiveType type;
    std::vector<int64_t> dims;
  };
  const In ins[] = {
      {atomic_numbers, xla::PrimitiveType::S32, {nn}},
      {batch.data(), xla::PrimitiveType::S32, {nn}},
      {vol, xla::PrimitiveType::F32, {1}},
      {edge_idx, xla::PrimitiveType::S32, {2, ne}},
      {edge_mask, xla::PrimitiveType::F32, {ne}},
      {edge_vec, xla::PrimitiveType::F32, {ne, 3}},
      {node_mask, xla::PrimitiveType::F32, {nn}},
      {natoms, xla::PrimitiveType::S32, {1}},
  };
  std::vector<std::unique_ptr<xla::PjRtBuffer>> bufs;
  for (const In& in : ins) {
    auto b = st.client->BufferFromHostBuffer(
        in.data, in.type, in.dims, std::nullopt,
        xla::PjRtClient::HostBufferSemantics::
            kImmutableUntilTransferCompletes,
        nullptr, st.mem, nullptr);
    if (!b.ok()) return 8;
    bufs.push_back(std::move(*b));
  }
  std::vector<xla::PjRtBuffer*> args;
  for (auto& b : bufs) args.push_back(b.get());

  auto results_or =
      st.executable->Execute({{args}}, xla::ExecuteOptions{});
  if (!results_or.ok()) return 9;
  const auto& results = (*results_or)[0];
  float* outs[] = {energy_out, forces_out, stress_out};
  const size_t sizes[] = {sizeof(float), 3 * nn * sizeof(float),
                          6 * sizeof(float)};
  for (size_t i = 0; i < results.size() && i < 3; ++i) {
    results[i]->GetReadyFuture().BlockUntilReady(
        static_cast<void (*)(tsl::AsyncValue*)>(tsl::BlockUntilReady));
    auto ext = results[i]->AcquireExternalReference();
    if (!ext.ok()) return 10;
    std::memcpy(outs[i], (*ext)->OpaqueDeviceMemoryDataPointer(),
                sizes[i]);
  }
  return 0;
}

int sevenn_exec_free() {
  delete g_state;
  g_state = nullptr;
  return 0;
}

}  // extern "C"
