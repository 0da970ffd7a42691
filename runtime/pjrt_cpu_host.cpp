// In-process PJRT host executor: proves the serving execute leg.
//
// Loads a deployed StableHLO artifact (scripts/deploy.py ->
// model_const.stablehlo, parameters baked in as constants), compiles it with
// the in-process XLA:CPU PJRT client exported by TensorFlow's
// libtensorflow_cc, feeds the flat data arrays, and writes the outputs back
// as raw binaries. A pytest (tests/test_pjrt_host.py) compares the E/F/S it
// produces against model.apply on identical inputs -- the role the
// TorchScript reload plays for the reference's pair styles
// (pair_e3gnn.cpp:228 executes the deployed model per MD step).
//
// Usage:   pjrt_cpu_host <artifact_dir>
//   reads  <artifact_dir>/model_const.stablehlo
//          <artifact_dir>/inputs.manifest   lines: <bin> <dtype> <ndim> <dims...>
//                                           dtype in {f32, s32}; row-major raw
//   writes <artifact_dir>/out_<i>.bin       one per program result
//
// Build (see tools/build_pjrt_host.sh): links against the pip wheel's
// libtensorflow_cc.so.2. The wheel ships the XLA headers but not llvm's, so
// runtime/mlir_stub provides ABI-preserving stand-ins for the few mlir types
// the PJRT headers name (we never touch mlir objects), and
// ParseMlirModuleStringAndConvertToXlaComputation is declared locally with
// the exact exported signature instead of including mlir_to_hlo.h (which
// drags in ungenerated .inc files).

#include <cstdint>
#include <fstream>
#include <iostream>
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

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(1);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

struct InputSpec {
  std::string file;
  xla::PrimitiveType type;
  std::vector<int64_t> dims;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2) {
    std::cerr << "usage: pjrt_cpu_host <artifact_dir>\n";
    return 2;
  }
  const std::string dir = argv[1];
  const std::string mlir_text = ReadFile(dir + "/model_const.stablehlo");

  std::cerr << "[host] parsing module (" << mlir_text.size() << " bytes)\n";
  xla::XlaComputation computation;
  absl::Status st = xla::ParseMlirModuleStringAndConvertToXlaComputation(
      mlir_text, computation, /*use_tuple_args=*/false,
      /*return_tuple=*/false);
  if (!st.ok()) {
    std::cerr << "parse: " << st.ToString() << "\n";
    return 1;
  }

  std::cerr << "[host] parse done\n";
  auto client_or = xla::GetXlaPjrtCpuClient(xla::CpuClientOptions{});
  if (!client_or.ok()) {
    std::cerr << "client: " << client_or.status().ToString() << "\n";
    return 1;
  }
  std::unique_ptr<xla::PjRtClient> client = std::move(*client_or);

  std::cerr << "[host] client up\n";
  auto exec_or = client->CompileAndLoad(computation, xla::CompileOptions{});
  if (!exec_or.ok()) {
    std::cerr << "compile: " << exec_or.status().ToString() << "\n";
    return 1;
  }
  auto executable = std::move(*exec_or);
  std::cerr << "[host] compiled\n";

  // inputs in the flat order recorded by signature.yaml (sorted key names,
  // scripts/deploy.py _export_stablehlo)
  std::ifstream manifest(dir + "/inputs.manifest");
  if (!manifest) {
    std::cerr << "cannot open " << dir << "/inputs.manifest\n";
    return 1;
  }
  std::vector<InputSpec> specs;
  std::string line;
  while (std::getline(manifest, line)) {
    if (line.empty()) continue;
    std::istringstream ls(line);
    InputSpec s;
    std::string dtype;
    int ndim = 0;
    ls >> s.file >> dtype >> ndim;
    for (int i = 0; i < ndim; ++i) {
      int64_t d;
      ls >> d;
      s.dims.push_back(d);
    }
    if (dtype == "f32") {
      s.type = xla::PrimitiveType::F32;
    } else if (dtype == "s32" || dtype == "i32") {
      s.type = xla::PrimitiveType::S32;
    } else {
      std::cerr << "unsupported dtype " << dtype << "\n";
      return 1;
    }
    specs.push_back(std::move(s));
  }

  xla::PjRtDevice* device = client->addressable_devices()[0];
  auto mem_or = device->default_memory_space();
  if (!mem_or.ok()) {
    std::cerr << "memory space: " << mem_or.status().ToString() << "\n";
    return 1;
  }

  std::vector<std::string> host_data(specs.size());
  std::vector<std::unique_ptr<xla::PjRtBuffer>> buffers;
  for (size_t i = 0; i < specs.size(); ++i) {
    host_data[i] = ReadFile(dir + "/" + specs[i].file);
    auto buf_or = client->BufferFromHostBuffer(
        host_data[i].data(), specs[i].type, specs[i].dims,
        /*byte_strides=*/std::nullopt,
        xla::PjRtClient::HostBufferSemantics::kImmutableUntilTransferCompletes,
        /*on_done_with_host_buffer=*/nullptr, *mem_or,
        /*device_layout=*/nullptr);
    if (!buf_or.ok()) {
      std::cerr << "buffer " << i << ": " << buf_or.status().ToString()
                << "\n";
      return 1;
    }
    buffers.push_back(std::move(*buf_or));
  }

  std::vector<xla::PjRtBuffer*> args;
  args.reserve(buffers.size());
  for (auto& b : buffers) args.push_back(b.get());

  std::cerr << "[host] buffers ready (" << args.size() << ")\n";
  auto results_or = executable->Execute({{args}}, xla::ExecuteOptions{});
  if (!results_or.ok()) {
    std::cerr << "execute: " << results_or.status().ToString() << "\n";
    return 1;
  }
  std::cerr << "[host] executed\n";
  const auto& results = (*results_or)[0];
  for (size_t i = 0; i < results.size(); ++i) {
    // Future<T>::Await()/ToLiteralSync() extract the payload through
    // tsl::AsyncValue::GetConcreteValue<T>, whose per-DSO type-id
    // statics mismatch between this binary's template instantiations
    // and libtensorflow_cc's (observed CHECK failure). BlockUntilReady
    // + AcquireExternalReference stay on non-template virtuals; CPU
    // buffers are dense row-major host memory.
    results[i]->GetReadyFuture().BlockUntilReady(
        static_cast<void (*)(tsl::AsyncValue*)>(tsl::BlockUntilReady));
    auto size_or = results[i]->GetOnDeviceSizeInBytes();
    if (!size_or.ok()) {
      std::cerr << "size " << i << ": " << size_or.status().ToString()
                << "\n";
      return 1;
    }
    auto ext_or = results[i]->AcquireExternalReference();
    if (!ext_or.ok()) {
      std::cerr << "extref " << i << ": " << ext_or.status().ToString()
                << "\n";
      return 1;
    }
    const char* p = static_cast<const char*>(
        (*ext_or)->OpaqueDeviceMemoryDataPointer());
    std::ofstream out(dir + "/out_" + std::to_string(i) + ".bin",
                      std::ios::binary);
    out.write(p, static_cast<std::streamsize>(*size_or));
    std::cout << "out_" << i << " bytes=" << *size_or << std::endl;
  }
  std::cout << "ok" << std::endl;
  return 0;
}
